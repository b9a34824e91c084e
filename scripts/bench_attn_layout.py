"""(A) d=64 vs d=128 MXU micro; (B) layout-native attention kernel
([B,S,H*D] in/out, head slices inside the kernel, no XLA transposes)."""

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
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


# ---------------------------------------------------------------- (A) micro
def micro_kernel(q_ref, k_ref, v_ref, o_ref, *, n):
    for h in range(n):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        o_ref[0, h] = jax.lax.dot_general(
            logits.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def run_micro(q, k, v, block_q):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    return pl.pallas_call(
        functools.partial(micro_kernel, n=h),
        grid=(b, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, h, block_q, d), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk, d), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk, d), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


# ------------------------------------------------------- (B) layout-native
def packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads, hd):
    for h in range(n_heads):
        q = q_ref[0][:, h * hd:(h + 1) * hd]
        k = k_ref[0][:, h * hd:(h + 1) * hd]
        v = v_ref[0][:, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / s).astype(v.dtype)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def packed_attention(q, k, v, n_heads, block_q=512):
    """q [B, Sq, H*hd], k/v [B, Sk, H*hd] -> [B, Sq, H*hd]."""
    b, sq, c = q.shape
    sk = k.shape[1]
    hd = c // n_heads
    scale = 1.0 / np.sqrt(hd)
    return pl.pallas_call(
        functools.partial(packed_kernel, scale=scale, n_heads=n_heads, hd=hd),
        grid=(b, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def split_heads(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def main():
    rng = np.random.default_rng(0)
    B, H, SQ, SK, HD = 32, 6, 1024, 1024, 64

    print("(A) packed-contraction micro (matmuls only, equal FLOPs):")
    for h, d in [(6, 64), (3, 128)]:
        q = jnp.asarray(rng.normal(size=(B, h, SQ, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, h, SK, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, h, SK, d)), jnp.bfloat16)
        flops = 4 * B * h * SQ * SK * d
        sec = timed(lambda q_, k_, v_: run_micro(q_, k_, v_, 512), (q, k, v))
        print(f"  h={h} d={d:4d}: {sec*1e6:9.1f} us {flops/sec/1e12:7.2f} TF/s",
              flush=True)

    print("(B) [B,S,C] -> [B,S,C] attention (incl. any transposes):")
    qf = jnp.asarray(rng.normal(size=(B, SQ, H * HD)), jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(B, SK, H * HD)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(B, SK, H * HD)), jnp.bfloat16)
    flops = 4 * B * H * SQ * SK * HD

    def current(q, k, v):
        out = fused_attention(split_heads(q, H), split_heads(k, H),
                              split_heads(v, H), use_pallas=True)
        return merge_heads(out)

    sec = timed(current, (qf, kf, vf))
    print(f"  current (transpose + v2)  {sec*1e6:9.1f} us {flops/sec/1e12:7.2f} TF/s",
          flush=True)
    try:
        sec = timed(lambda q, k, v: packed_attention(q, k, v, H), (qf, kf, vf))
        print(f"  layout-native packed      {sec*1e6:9.1f} us {flops/sec/1e12:7.2f} TF/s",
              flush=True)
        a = np.asarray(current(qf, kf, vf), np.float32)
        b_ = np.asarray(packed_attention(qf, kf, vf, H), np.float32)
        print(f"  max abs diff vs current: {np.abs(a - b_).max():.2e}")
    except Exception as e:
        print(f"  layout-native FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
