"""Experiment: fuse the cross-attention q projection INTO the shared-kv
pair kernel (docs/PERFORMANCE.md "Known headroom" — raise arithmetic
intensity per pass, kill the q [B,Sq,C] HBM round trip).

Decode hot path today:  q = x @ Wq + b  (XLA GEMM, ~160-170 TF/s)
                        out = pair_kv_shared(q, kv)   (Pallas)
Fused variant:          out = pair_kv_shared_fused(x, Wq, b, kv)
                        (q tile computed in-kernel per head-pair block)

Per program the fused kernel adds a [block_q, C] x [C, 128] dot (+19%
kernel FLOPs at C=384) and reads the full-C x tile (3x the q-tile
bytes), in exchange for removing the standalone GEMM and q's write+read.
Context: the fused-MLP experiment (bench_fused_mlp.py) LOST 9% to the
Mosaic-vs-XLA GEMM deficit at skinny shapes — this measures whether the
attention kernel's occupancy profile changes the verdict.

Usage: python scripts/bench_fused_qproj.py [--batch 64] [--iters 20]
"""

import argparse
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ed_tpu.ops.attention import (  # noqa: E402
    _EXP2_CLAMP, _LOG2E, _pair_geometry, _sum_column_values,
    fused_attention_packed_kv_shared)


def _fused_kernel(x_ref, wq_ref, bq_ref, k_ref, v_ref, o_ref, *,
                  scale: float, kv_len: int):
    x = x_ref[0]                       # [block_q, C]
    wq = wq_ref[...]                   # [C, 128]  (head-pair columns)
    bq = bq_ref[...]                   # [1, 128]
    # EXACT flax-Dense rounding: f32-accum dot -> bf16, then bf16 bias
    # add (so the fused path can be bit-compared with the XLA chain)
    q = jax.lax.dot_general(
        x, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bq
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(x.dtype)

    k = k_ref[0]                       # [sk_pad, 128]
    v = v_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane >= 64, k, jnp.zeros_like(k))
    v0, v1 = _sum_column_values(v, kv_len)

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            qs, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = jnp.exp2(jnp.minimum(logits, _EXP2_CLAMP)).astype(v.dtype)
        return jax.lax.dot_general(
            e, v_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    d0 = head(k_lo, v0)
    d1 = head(k_hi, v1)
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o_ref[0] = jnp.where(olane < 64, d0 / s0, d1 / s1).astype(o_ref.dtype)


def fused_qproj_kv_shared(x, wq, bq, kv, scale):
    """x [B, Sq, C] (pre-projection), kv [1, Sk, 2C] shared."""
    b, sq, c = x.shape
    sk = kv.shape[1]
    g = c // 128
    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=1024)
    if sq_pad != sq:
        x = jnp.pad(x, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - sk), (0, 0)))
    bq2 = bq.reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale, kv_len=sk),
        grid=(n_blocks, g, b),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, gi, bi: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 128), lambda i, gi, bi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, gi, bi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda i, gi, bi: (0, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128),
                         lambda i, gi, bi, _g=g: (0, 0, _g + gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda i, gi, bi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, c), x.dtype),
        )(x, wq, bq2, kv, kv)
    return out[:, :sq, :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    b, sq, c = args.batch, 1025, 384
    sk = 1025
    heads = 6
    scale = 1.0 / math.sqrt(c // heads)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, sq, c)) * 0.2, jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.bfloat16)
    bq = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(1, sk, 2 * c)) * 0.2, jnp.bfloat16)

    def xla_chain(x, wq, bq, kv):
        # flax Dense semantics at dtype bf16: f32-accum dot rounded to
        # bf16, bias added in bf16
        q = jax.lax.dot_general(
            x, wq, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype) + bq
        return fused_attention_packed_kv_shared(q, kv, heads, scale=scale)

    def fused(x, wq, bq, kv):
        return fused_qproj_kv_shared(x, wq, bq, kv, scale)

    a = np.asarray(jax.jit(xla_chain)(x, wq, bq, kv), np.float32)
    f = np.asarray(jax.jit(fused)(x, wq, bq, kv), np.float32)
    neq = int(np.sum(a != f))
    err = np.max(np.abs(a - f) / (np.abs(a) + 1e-3))
    print(f"fused vs chain: neq {neq}/{a.size}, max rel dev {err:.2e}",
          flush=True)

    t_chain = _timed_scan(xla_chain, (x, wq, bq, kv), args.iters)
    t_fused = _timed_scan(fused, (x, wq, bq, kv), args.iters)
    print(f"batch {b}: XLA q-GEMM + kernel {t_chain * 1e3:8.2f} ms | "
          f"fused q-proj kernel {t_fused * 1e3:8.2f} ms | "
          f"fused/chain = {t_fused / t_chain:.3f}", flush=True)


if __name__ == "__main__":
    main()
