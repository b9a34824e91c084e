"""Experiment round 4: native-layout QK via pre-transposed K.

The MXU's native contraction takes the LHS's lane axis against the RHS's
SUBLANE axis. The pair kernel's QK contracts q's lanes with k's lanes
(dimension numbers (1,1)) — Mosaic has to relayout K in-kernel. Here K
arrives transposed ([B, C, Sk]: channels on sublanes, sequence on lanes)
so QK is a native (1,0) contraction; the XLA-side transpose cost is
measured separately (and could be folded into the kv projection).
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
    _pair_geometry,
    _round_up,
    reference_attention,
)

LOG2E = math.log2(math.e)
CLAMP = 80.0


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


def kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, kv_len: int):
    """kt [128, sk_pad]: channels on sublanes. Native QK contraction."""
    q = q_ref[0]                      # [bq, 128]
    kt = kt_ref[0]                    # [128, sk_pad]
    v = v_ref[0]                      # [sk_pad, 128]

    srow = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 0)
    kt_lo = jnp.where(srow < 64, kt, jnp.zeros_like(kt))
    kt_hi = jnp.where(srow >= 64, kt, jnp.zeros_like(kt))

    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    vf = v.astype(jnp.float32)
    ones_col = jnp.where(row < kv_len, 1.0, 0.0)
    v0 = (jnp.where(lane < 64, vf, 0.0)
          + jnp.where(lane == 64, ones_col, 0.0)).astype(v.dtype)
    v1 = (jnp.where(lane >= 64, vf, 0.0)
          + jnp.where(lane == 0, ones_col, 0.0)).astype(v.dtype)

    def head(kt_m, v_m):
        logits = jax.lax.dot_general(
            q, kt_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, sk_pad]
        e = jnp.exp2(jnp.minimum(logits, CLAMP)).astype(v.dtype)
        return jax.lax.dot_general(
            e, v_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    d0 = head(kt_lo, v0)
    d1 = head(kt_hi, v1)
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0 / s0, d1 / s1)
    o_ref[0] = o.astype(o_ref.dtype)


def fwd_kt(q, kt, v, scale, kv_len=None, block_q=None):
    """q [B, Sq, C], kt [B, C, Sk_pad], v [B, Sk_pad, C]."""
    b, sq, c = q.shape
    sk_pad = kt.shape[2]
    g = c // 128
    if kv_len is None:
        kv_len = sk_pad

    if block_q is None:
        n_blocks, block_q, sq_pad, _ = _pair_geometry(sq, sk_pad)
    else:
        n_blocks = _cdiv(sq, block_q)
        sq_pad = block_q * n_blocks
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    out = pl.pallas_call(
        functools.partial(kernel_kt, kv_len=kv_len),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, sk_pad), lambda bi, i, gi: (bi, gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, kt, v)
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

        # pad sk on lanes to 128 multiple for the transposed layout; padded
        # key columns get q.k = 0 -> e = 1 BUT v rows/ones are zeroed, so
        # they contribute nothing (deferred normalization)
        sk_pad = _round_up(sk, 128)
        kp = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

        def with_transpose(qq, kk, vv, block_q=None):
            kt = jnp.swapaxes(kk, 1, 2)
            return fwd_kt(qq, kt, vv, scale, kv_len=sk, block_q=block_q)

        # kernel-only: transpose excluded from timing
        kt = jnp.swapaxes(kp, 1, 2)  # [B, C, sk_pad]
        out = np.asarray(fwd_kt(q, kt, vp, scale, kv_len=sk), np.float32)
        err = np.abs(out - ref).max()
        t_k = timed(lambda qq, _kt, _v: fwd_kt(qq, _kt, _v, scale, kv_len=sk),
                    (q, kt, vp))
        t_t = timed(lambda qq, _k, _v: with_transpose(qq, _k, _v), (q, kp, vp))
        print(f"{name}: kt-kernel {t_k*1e6:.0f}us ({useful/t_k/1e12:.1f} useful "
              f"TF/s, err {err:.4f}) | incl. XLA transpose {t_t*1e6:.0f}us "
              f"({useful/t_t/1e12:.1f})")


if __name__ == "__main__":
    main()
