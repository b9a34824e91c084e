"""Ring attention (sequence-parallel, shard_map + ppermute) vs the
reference softmax attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ed_tpu.ops.attention import reference_attention
from vit_ed_tpu.ops.ring_attention import ring_attention
from vit_ed_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh((8,), axis_names=("model",))


def _rand(shape, key, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(key).normal(size=shape), dtype)


@pytest.mark.parametrize("sq,sk", [(64, 64),   # self-attention, even blocks
                                   (65, 40),   # cross, uneven, padding
                                   (8, 128),   # short queries, long context
                                   (17, 3)])   # ring larger than some blocks
def test_ring_matches_reference(mesh, sq, sk):
    q = _rand((2, 3, sq, 16), 0)
    k = _rand((2, 3, sk, 16), 1)
    v = _rand((2, 3, sk, 16), 2)
    ref = np.asarray(reference_attention(q, k, v))
    out = np.asarray(ring_attention(q, k, v, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)


def test_ring_bf16_inputs(mesh):
    q = _rand((1, 2, 32, 32), 3, jnp.bfloat16)
    k = _rand((1, 2, 48, 32), 4, jnp.bfloat16)
    v = _rand((1, 2, 48, 32), 5, jnp.bfloat16)
    ref = np.asarray(reference_attention(q, k, v).astype(jnp.float32))
    out = np.asarray(ring_attention(q, k, v, mesh).astype(jnp.float32))
    # both paths accumulate in f32; bf16 rounding of q/k/v products differs
    # only through reduction order inside each block
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_ring_output_stays_sequence_sharded(mesh):
    """The result comes back sharded over the sequence axis — ready to be
    consumed by sequence-parallel blocks without a gather."""
    from jax.sharding import PartitionSpec as P

    q = _rand((1, 2, 64, 16), 6)
    k = _rand((1, 2, 64, 16), 7)
    v = _rand((1, 2, 64, 16), 8)
    out = ring_attention(q, k, v, mesh)
    assert out.sharding.spec == P(None, None, "model", None)


def test_ring_grad_matches_reference(mesh):
    """jax.grad flows through shard_map + ppermute + the online-softmax
    scan: gradients match the reference attention's."""
    q = _rand((1, 2, 32, 16), 9)
    k = _rand((1, 2, 32, 16), 10)
    v = _rand((1, 2, 32, 16), 11)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v).astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=5e-5, rtol=1e-4)


def test_model_ring_attn_matches_replicated():
    """ViTED.ring_attn: the full model with sequence-parallel ring
    attention (on top of act_sharding) computes the replicated model's
    function, and the compiled encode moves K/V blocks by
    collective-permute."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_ed_tpu.models.vit_ed import ViTED

    mesh2d = create_mesh((2, 4), axis_names=("data", "model"))
    act = NamedSharding(mesh2d, P("data", "model", None))
    kw = dict(img_size=64, patch_size=8, num_classes=4, embed_dim=64,
              depth=2, c_depth=2, num_heads=4, use_pallas=False)
    m_ring = ViTED(**kw, act_sharding=act, ring_attn=True)
    m_rep = ViTED(**kw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2, 64, 64, 3)), jnp.float32)
    params = m_rep.init(jax.random.PRNGKey(0), x)["params"]
    # ring_attn must not change the param tree (checkpoint compatibility);
    # init under jit — eager with_sharding_constraint enforces divisibility
    # on the 65-token axis, while GSPMD pads unevenly under jit
    ring_params = jax.jit(m_ring.init)(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(ring_params)
            == jax.tree_util.tree_structure(params))

    want = np.asarray(m_rep.apply({"params": params}, x))
    fwd = jax.jit(lambda p, a: m_ring.apply({"params": p}, a),
                  out_shardings=NamedSharding(mesh2d, P()))
    got = np.asarray(fwd(params, jax.device_put(
        x, NamedSharding(mesh2d, P("data")))))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    enc = jax.jit(
        lambda p, a: m_ring.apply({"params": p}, a, forward_first_part=True))
    txt = enc.lower(params, x[:, 0]).compile().as_text()
    assert "collective-permute" in txt


def test_model_ring_attn_requires_act_sharding():
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=32, patch_size=16, embed_dim=32, depth=1,
                  c_depth=1, num_heads=2, ring_attn=True, use_pallas=False)
    with pytest.raises(ValueError, match="act_sharding"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))
