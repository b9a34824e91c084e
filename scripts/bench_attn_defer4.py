"""Experiment round 3: kill the max-reduce (static clamp) and chunk K.

With deferred normalization the softmax max-subtraction is only overflow
protection — any finite bound works, and outputs are ratios so they are
unchanged. exp2(clamp(l, -inf, 80)) is a single fused VPU pass: no
lane-reduction over sk, no second traversal of the f32 logits.

The chunked variant streams K/V in sublane chunks accumulating the
(numerator|denominator) [bq, 128] in f32 — the f32 logits tile shrinks by
the chunk factor, cutting VMEM traffic.
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
CLAMP = 80.0    # exp2(80) ~ 1.2e24; sums stay far below f32 max


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


def _masked_kv(k, v, kv_len):
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
    return k_lo, k_hi, v0, v1


def kernel_clamp(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """No max-reduce: exp2 with a static overflow clamp."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_lo, k_hi, v0, v1 = _masked_kv(k, v, kv_len)

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = jnp.exp2(jnp.minimum(logits, CLAMP)).astype(v.dtype)
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


def kernel_clamp_bf16(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """Clamp variant with bf16 logits drain (half the MXU->VMEM result
    traffic; ~8-bit logit mantissa)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_lo, k_hi, v0, v1 = _masked_kv(k, v, kv_len)

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        e = jnp.exp2(jnp.minimum(logits.astype(jnp.float32), CLAMP)).astype(v.dtype)
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


def kernel_clamp_bf16e(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """bf16 drain AND bf16 exp2 (no f32 roundtrip at all)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_lo, k_hi, v0, v1 = _masked_kv(k, v, kv_len)
    clamp_b = jnp.asarray(CLAMP, jnp.bfloat16)

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        e = jnp.exp2(jnp.minimum(logits, clamp_b))
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


def kernel_clamp_split(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """Clamp variant with the key axis split into a 128-aligned main part
    and a tiny tail, so logits lane tiles are fully used (sk=1025 pays a
    1152-wide executed tile otherwise)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_lo, k_hi, v0, v1 = _masked_kv(k, v, kv_len)
    sk_pad = k.shape[0]
    main = (sk_pad // 128) * 128

    def head(k_m, v_m):
        d = jnp.zeros((q.shape[0], 128), jnp.float32)
        for lo, hi in ([(0, main), (main, sk_pad)] if main not in (0, sk_pad)
                       else [(0, sk_pad)]):
            logits = jax.lax.dot_general(
                q, k_m[lo:hi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = jnp.exp2(jnp.minimum(logits, CLAMP)).astype(v.dtype)
            d = d + jax.lax.dot_general(
                e, v_m[lo:hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return d

    d0 = head(k_lo, v0)
    d1 = head(k_hi, v1)
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0 / s0, d1 / s1)
    o_ref[0] = o.astype(o_ref.dtype)


def kernel_chunk(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, n_chunks: int):
    """K/V streamed in sublane chunks; numerator+denominator accumulate."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_lo, k_hi, v0, v1 = _masked_kv(k, v, kv_len)
    sk_pad = k.shape[0]
    chunk = sk_pad // n_chunks

    def head(k_m, v_m):
        d = jnp.zeros((q.shape[0], 128), jnp.float32)
        for ci in range(n_chunks):
            kc = k_m[ci * chunk:(ci + 1) * chunk]
            vc = v_m[ci * chunk:(ci + 1) * chunk]
            logits = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = jnp.exp2(jnp.minimum(logits, CLAMP)).astype(v.dtype)
            d = d + jax.lax.dot_general(
                e, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return d

    d0 = head(k_lo, v0)
    d1 = head(k_hi, v1)
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0 / s0, d1 / s1)
    o_ref[0] = o.astype(o_ref.dtype)


def fwd(q, k, v, scale, kernel, block_q=None, **kw):
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

    out = pl.pallas_call(
        functools.partial(kernel, kv_len=sk, **kw),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
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

        cases = [
            ("clamp_bq1024", kernel_clamp,
             dict(block_q=_round_up(sq, 8))),
            ("split_bq1024", kernel_clamp_split,
             dict(block_q=_round_up(sq, 8))),
            ("split_bq512", kernel_clamp_split, dict()),
        ]
        for vname, kern, kwargs in cases:
            try:
                out = np.asarray(fwd(q, k, v, scale, kern, **kwargs), np.float32)
                t = timed(lambda qq, kk, vv, _k=kern, _kw=kwargs:
                          fwd(qq, kk, vv, scale, _k, **_kw), (q, k, v))
                print(f"{name} {vname}: {t*1e6:.0f}us "
                      f"({useful/t/1e12:.1f} useful TF/s, "
                      f"err {np.abs(out - ref).max():.4f})")
            except Exception as e:
                print(f"{name} {vname}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
