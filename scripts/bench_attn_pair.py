"""Prototype: head-pair masked attention from [B,S,C] layout.

Two d=64 heads share one 128-lane group. Per-head logits come from
contracting q_pair with a lane-masked k_pair (masked lanes contribute 0),
so every matmul runs full-width with no transposes or 64-lane relayouts.
k/v sequence lives on SUBLANES (pad to 8), killing the 1025->1152 padding.
"""

import functools
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

from vit_ed_tpu.ops.attention import fused_attention


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


def _round_up(a, b):
    return -(-a // b) * b


def pair_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    q = q_ref[0]                     # [bq, 128]
    k = k_ref[0]                     # [sk_pad, 128]
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane >= 64, k, jnp.zeros_like(k))

    def head_probs(k_masked):
        logits = jax.lax.dot_general(
            q, k_masked, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [bq, sk_pad]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        return (e / s).astype(v.dtype)

    p0 = head_probs(k_lo)
    p1 = head_probs(k_hi)
    d0 = jax.lax.dot_general(p0, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [bq,128]
    d1 = jax.lax.dot_general(p1, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0, d1)
    o_ref[0] = o.astype(o_ref.dtype)


def pair_attention(q, k, v, scale=None, block_q=None):
    """q [B,Sq,C], k/v [B,Sk,C] with head_dim=64 -> [B,Sq,C]."""
    b, sq, c = q.shape
    sk = k.shape[1]
    assert c % 128 == 0
    g = c // 128
    if scale is None:
        scale = 1.0 / np.sqrt(64.0)

    n_blocks = -(-sq // 512)
    block_q = _round_up(-(-sq // n_blocks), 8)
    sq_pad = block_q * n_blocks
    sk_pad = _round_up(sk, 8)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    out = pl.pallas_call(
        functools.partial(pair_kernel, scale=scale, kv_len=sk),
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


def split_heads(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def main():
    rng = np.random.default_rng(0)
    H = 6
    for B, SQ, SK in [(32, 1024, 1024), (32, 1025, 1024), (32, 1025, 1025)]:
        q = jnp.asarray(rng.normal(size=(B, SQ, 384)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, SK, 384)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, SK, 384)), jnp.bfloat16)
        flops = 4 * B * H * SQ * SK * 64
        print(f"B={B} Sq={SQ} Sk={SK}:")

        def current(q_, k_, v_):
            return merge_heads(fused_attention(split_heads(q_, H), split_heads(k_, H),
                                               split_heads(v_, H), use_pallas=True))

        sec = timed(current, (q, k, v))
        print(f"  current (transp+v2) {sec*1e6:9.1f} us {flops/sec/1e12:6.2f} TF/s",
              flush=True)
        try:
            sec = timed(pair_attention, (q, k, v))
            a = np.asarray(current(q, k, v), np.float32)
            b_ = np.asarray(pair_attention(q, k, v), np.float32)
            err = np.abs(a - b_).max()
            print(f"  pair-masked         {sec*1e6:9.1f} us {flops/sec/1e12:6.2f} TF/s"
                  f"  maxdiff {err:.2e}", flush=True)
        except Exception as e:
            print(f"  pair-masked FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
