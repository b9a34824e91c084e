"""Pallas fused attention vs the XLA reference, run in interpreter mode on
CPU (kernel-exact on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vit_ed_tpu.ops.attention as attn_mod
from vit_ed_tpu.ops.attention import fused_attention, reference_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)


@pytest.mark.parametrize("sq,sk", [(64, 64), (65, 64), (130, 257), (128, 128)])
def test_forward_matches_reference(sq, sk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 3, sq, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, sk, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, sk, 32)), jnp.float32)
    out_ref = reference_attention(q, k, v)
    out = fused_attention(q, k, v, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-4)


def test_cross_attention_shapes():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 65, 16)), jnp.float32)  # CLS + 64
    k = jnp.asarray(rng.normal(size=(1, 2, 64, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 64, 16)), jnp.float32)
    out = fused_attention(q, k, v, use_pallas=True)
    out_ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 80, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 80, 16)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, use_pallas=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=5e-4, rtol=1e-3)


def test_bf16_path():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 1, 64, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 1, 64, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 1, 64, 32)), jnp.bfloat16)
    out = fused_attention(q, k, v, use_pallas=True)
    out_ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_ref, np.float32), atol=3e-2)


# ----------------------------------------------------------- packed kernel
def _packed_reference(q, k, v, h):
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // h

    def split(x, s):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    out = reference_attention(split(q, sq), split(k, sk), split(v, sk))
    return out.transpose(0, 2, 1, 3).reshape(b, sq, c)


@pytest.mark.parametrize("sq,sk,h", [(257, 256, 2), (130, 257, 4),
                                     (1025, 1024, 6), (64, 300, 2)])
def test_packed_forward_matches_reference(sq, sk, h):
    from vit_ed_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(0)
    c = h * 64
    q = jnp.asarray(rng.normal(size=(2, sq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, sk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, sk, c)), jnp.float32)
    out = fused_attention_packed(q, k, v, h, use_pallas=True)
    out_ref = _packed_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-4)


def test_packed_gradients_match_reference():
    from vit_ed_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(5)
    h, c = 2, 128
    q = jnp.asarray(rng.normal(size=(1, 70, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 80, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 80, c)), jnp.float32)

    def loss_packed(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, h, use_pallas=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_packed_reference(q, k, v, h) ** 2)

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("sq,sk", [(600, 520), (513, 600), (516, 516)])
def test_packed_gradients_multiblock(sq, sk):
    # > 512 query tokens -> multiple q blocks: exercises the fused
    # backward kernel's dk/dv accumulation across grid steps plus the
    # padded-row and padded-column masks (odd lengths)
    from vit_ed_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(11)
    h, c = 2, 128
    q = jnp.asarray(rng.normal(size=(2, sq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, sk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, sk, c)), jnp.float32)

    def loss_packed(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, h, use_pallas=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_packed_reference(q, k, v, h) ** 2)

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-3, rtol=1e-3)


def test_packed_fallback_head_dim_not_64():
    from vit_ed_tpu.ops.attention import fused_attention_packed

    rng = np.random.default_rng(6)
    h, c = 4, 128  # head_dim 32 -> falls back to the 4-D path
    q = jnp.asarray(rng.normal(size=(1, 64, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 64, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 64, c)), jnp.float32)
    out = fused_attention_packed(q, k, v, h, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_packed_reference(q, k, v, h)),
                               atol=2e-4)


@pytest.mark.parametrize("s,h", [(257, 2), (1025, 6)])
def test_packed_qkv_matches_split_path(s, h):
    from vit_ed_tpu.ops.attention import (fused_attention_packed,
                                          fused_attention_packed_qkv)

    rng = np.random.default_rng(7)
    c = h * 64
    qkv = jnp.asarray(rng.normal(size=(2, s, 3 * c)), jnp.float32)
    out = fused_attention_packed_qkv(qkv, h, use_pallas=True)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = fused_attention_packed(q, k, v, h, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_kv_matches_split_path():
    from vit_ed_tpu.ops.attention import (fused_attention_packed,
                                          fused_attention_packed_kv)

    rng = np.random.default_rng(8)
    h, c = 2, 128
    q = jnp.asarray(rng.normal(size=(2, 261, c)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 300, 2 * c)), jnp.float32)
    out = fused_attention_packed_kv(q, kv, h, use_pallas=True)
    k, v = jnp.split(kv, 2, axis=-1)
    ref = fused_attention_packed(q, k, v, h, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_kv_shared_matches_broadcast():
    """The shared-context kernel (one kv row serving the whole q batch —
    the row-sharded O(N^2) scan chunk) must equal the per-pair kernel on
    a materialised broadcast."""
    from vit_ed_tpu.ops.attention import (fused_attention_packed_kv,
                                          fused_attention_packed_kv_shared)

    rng = np.random.default_rng(9)
    h, c, b = 2, 128, 3
    for sq, sk in [(261, 300), (64, 64), (1025, 1024)]:
        q = jnp.asarray(rng.normal(size=(b, sq, c)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(1, sk, 2 * c)), jnp.float32)
        out = fused_attention_packed_kv_shared(q, kv, h, use_pallas=True)
        kv_b = jnp.broadcast_to(kv, (b, sk, 2 * c))
        ref = fused_attention_packed_kv(q, kv_b, h, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_packed_qkv_cls_matches_full_first_row():
    """The CLS-query kernel (last-decoder-block short-circuit) must equal
    the first output row of the full packed qkv kernel."""
    from vit_ed_tpu.ops.attention import (fused_attention_packed_qkv,
                                          fused_attention_packed_qkv_cls)

    rng = np.random.default_rng(10)
    h, c, b = 2, 128, 3
    for s in (64, 261, 1025):
        qkv = jnp.asarray(rng.normal(size=(b, s, 3 * c)), jnp.float32)
        out = fused_attention_packed_qkv_cls(qkv, h, use_pallas=True)
        full = fused_attention_packed_qkv(qkv, h, use_pallas=True)
        assert out.shape == (b, 1, c)
        # CPU interpret mode blocks the f32 dot accumulation differently
        # for the 8-row q block vs the full q block (ulp-level); on TPU
        # the per-row MXU accumulation is identical
        np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, :1]),
                                   rtol=1e-5, atol=1e-6)


def test_packed_qkv_cls_gradients():
    """The CLS kernel's custom VJP (Sq=1 padded to an 8-row block, dQ
    scattered into row 0) must match autodiff through the XLA reference
    formulation restricted to the CLS query. This is the default flagship
    TRAINING path's last decoder block — a regression here silently
    corrupts training gradients."""
    from vit_ed_tpu.ops.attention import (fused_attention_packed,
                                          fused_attention_packed_qkv_cls)

    rng = np.random.default_rng(11)
    h, c, b = 2, 128, 2
    for s in (64, 261):
        qkv = jnp.asarray(rng.normal(size=(b, s, 3 * c)), jnp.float32)

        def loss_cls(a):
            out = fused_attention_packed_qkv_cls(a, h, use_pallas=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_ref(a):
            q, k, v = jnp.split(a, 3, axis=-1)
            out = fused_attention_packed(q[:, :1], k, v, h, use_pallas=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_cls = np.asarray(jax.grad(loss_cls)(qkv))
        g_ref = np.asarray(jax.grad(loss_ref)(qkv))
        # the non-CLS query rows' dQ must be exactly zero
        np.testing.assert_array_equal(g_cls[:, 1:, :c], np.zeros_like(g_cls[:, 1:, :c]))
        np.testing.assert_allclose(g_cls, g_ref, rtol=2e-4, atol=2e-5)


def test_packed_qkv_gradients():
    from vit_ed_tpu.ops.attention import fused_attention_packed_qkv

    rng = np.random.default_rng(9)
    h, c = 2, 128
    qkv = jnp.asarray(rng.normal(size=(1, 280, 3 * c)), jnp.float32)

    def loss_fused(t):
        return jnp.sum(fused_attention_packed_qkv(t, h, use_pallas=True) ** 2)

    def loss_ref(t):
        q, k, v = jnp.split(t, 3, axis=-1)
        return jnp.sum(_packed_reference(q, k, v, h) ** 2)

    gf = jax.grad(loss_fused)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=5e-4, rtol=1e-3)


def test_train_step_through_packed_kernels():
    """Integration: a full ViTED train step with the Pallas packed
    attention path (fused qkv/kv forward + fused pair backward) — catches
    VJP wiring/dtype regressions that op-level grad tests can miss."""
    import optax

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.engine import TrainState, make_train_step
    from vit_ed_tpu.train.losses import bce_with_logits

    model = ViTED(img_size=64, patch_size=16, num_classes=1, embed_dim=128,
                  depth=1, c_depth=1, num_heads=2, dtype=jnp.bfloat16,
                  use_pallas=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.random(size=(2, 1)) > 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adamw(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, bce_with_logits, accum_steps=1)
    batch = {"samples": x[None], "targets": y[None]}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0.0
