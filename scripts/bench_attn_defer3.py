"""Experiment round 2: push the pair kernel's MXU pipeline efficiency.

bench_attn_defer2 showed the deferred-normalization kernel at ~46 useful
TF/s with a no-softmax floor of ~49 — the masked matmuls themselves run at
only ~2/3 of the chip's chained-GEMM rate. Variants here probe why:

- gridorder: q-blocks innermost so k/v (and the in-kernel masked copies)
  are built once per (b, g) — vs the current g-innermost order
- bq1024: one program per (b, g): no k/v rebuild at all, biggest M
- extkv: masked k_lo/k_hi/v0/v1 built OUTSIDE the kernel by XLA (VPU-free
  kernel; pays 2x k/v HBM traffic)
- bf16l: QK output drained as bf16 (half the MXU->VMEM result traffic),
  exp in f32 after upcast
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ed_tpu.ops.attention import (
    _cdiv,
    _pair_forward,
    _pair_geometry,
    _round_up,
    reference_attention,
)

LOG2E = math.log2(math.e)


def timed(fn, args, iters=30):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-24, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def _mask_kv(k, v, kv_len):
    """XLA-side masked/sum-column variants. k/v [B, sk_pad, C]."""
    lane = jnp.arange(128)
    c = k.shape[-1]
    g = c // 128
    kr = k.reshape(k.shape[0], k.shape[1], g, 128)
    vr = v.reshape(v.shape[0], v.shape[1], g, 128).astype(jnp.float32)
    k_lo = jnp.where(lane < 64, kr, 0).reshape(k.shape)
    k_hi = jnp.where(lane >= 64, kr, 0).reshape(k.shape)
    rows = (jnp.arange(k.shape[1]) < kv_len).astype(jnp.float32)[None, :, None]
    v0 = (jnp.where(lane < 64, vr, 0.0)
          + jnp.where(lane == 64, rows[..., None], 0.0)[..., 0, :] [..., None, :]
          ).reshape(v.shape)
    return k_lo, k_hi, v0


def kernel_defer(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, bf16_logits=False):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane >= 64, k, jnp.zeros_like(k))
    row = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    vf = v.astype(jnp.float32)
    ones_col = jnp.where(row < kv_len, 1.0, 0.0)
    v0 = (jnp.where(lane < 64, vf, 0.0)
          + jnp.where(lane == 64, ones_col, 0.0)).astype(v.dtype)
    v1 = (jnp.where(lane >= 64, vf, 0.0)
          + jnp.where(lane == 0, ones_col, 0.0)).astype(v.dtype)

    out_t = jnp.bfloat16 if bf16_logits else jnp.float32

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=out_t)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2((logits - m).astype(jnp.float32)).astype(v.dtype)
        return jax.lax.dot_general(
            e, v_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    d0 = head(k_lo, v0)
    d1 = head(k_hi, v1)
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0 / s0, d1 / s1)
    o_ref[0] = o.astype(o_ref.dtype)


def fwd(q, k, v, scale, grid_order="g_inner", block_q=None, bf16_logits=False):
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128

    if block_q is None:
        n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk)
    else:
        n_blocks = _cdiv(sq, block_q)
        sq_pad = block_q * n_blocks
        sk_pad = _round_up(max(sk, 8), 8)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    kern = functools.partial(kernel_defer, kv_len=sk, bf16_logits=bf16_logits)
    if grid_order == "g_inner":
        grid = (b, n_blocks, g)
        qmap = lambda bi, i, gi: (bi, i, gi)
        kmap = lambda bi, i, gi: (bi, 0, gi)
    else:
        grid = (b, g, n_blocks)
        qmap = lambda bi, gi, i: (bi, i, gi)
        kmap = lambda bi, gi, i: (bi, 0, gi)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), kmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), qmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)
    return out[:, :sq, :]


def to_heads(x, h):
    b, s, c = x.shape
    return x.reshape(b, s, h, c // h).transpose(0, 2, 1, 3)


def main():
    rng = np.random.default_rng(0)
    h = 6
    for (name, b, sq, sk, c) in [
        ("self1024", 64, 1024, 1024, 384),
        ("cross1025", 64, 1025, 1024, 384),
        ("self1025", 64, 1025, 1025, 384),
    ]:
        q = jnp.asarray(rng.normal(size=(b, sq, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, sk, c)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, sk, c)), jnp.bfloat16)
        scale = 1.0 / math.sqrt(64)

        ref = reference_attention(to_heads(q.astype(jnp.float32), h),
                                  to_heads(k.astype(jnp.float32), h),
                                  to_heads(v.astype(jnp.float32), h), scale)
        ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(b, sq, c))
        useful = 4 * b * h * sq * sk * 64

        for vname, kwargs in [
            ("g_inner(cur)", dict()),
            ("q_inner", dict(grid_order="q_inner")),
            ("bq1024", dict(block_q=1024 if sq == 1024 else 1032)),
            ("bq256", dict(block_q=256)),
            ("bf16l", dict(bf16_logits=True)),
            ("q_inner+bf16l", dict(grid_order="q_inner", bf16_logits=True)),
        ]:
            try:
                out = np.asarray(fwd(q, k, v, scale, **kwargs), np.float32)
                t = timed(lambda qq, kk, vv, _kw=kwargs: fwd(qq, kk, vv, scale, **_kw),
                          (q, k, v))
                print(f"{name} {vname}: {t*1e6:.0f}us "
                      f"({useful/t/1e12:.1f} useful TF/s, "
                      f"err {np.abs(out - ref).max():.4f})")
            except Exception as e:
                print(f"{name} {vname}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
