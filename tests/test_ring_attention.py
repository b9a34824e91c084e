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
