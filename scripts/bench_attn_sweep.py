"""Kernel-variant sweep for the d=64 attention problem.

All variants compute softmax(qk^T*scale)v for (32,6,1024,1024,64) from
UNTRANSPOSED [B,S,C] inputs (the layout the model naturally produces),
including any reshapes/transposes a variant needs.
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

B, H, SQ, SK, HD = 32, 6, 1024, 1024, 64
C = H * HD
SCALE = 1.0 / np.sqrt(HD)
FLOPS = 4 * B * H * SQ * SK * HD


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


def split_heads(x):
    b, n, c = x.shape
    return x.reshape(b, n, H, HD).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


# -------------------------------------------------- current (transpose + v2)
def v_current(q, k, v, block_q=512):
    return merge_heads(fused_attention(split_heads(q), split_heads(k),
                                       split_heads(v), use_pallas=True,
                                       block_q=block_q))


# -------------------------------------------- batched dot_general over heads
def bdg_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]          # [h, bq, d]
    k = k_ref[0]          # [h, sk, d]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * SCALE    # [h, bq, sk]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def v_bdg(q, k, v, block_q=512):
    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
    out = pl.pallas_call(
        bdg_kernel,
        grid=(B, SQ // block_q),
        in_specs=[
            pl.BlockSpec((1, H, block_q, HD), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, SK, HD), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, SK, HD), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, block_q, HD), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qh.shape, qh.dtype),
    )(qh, kh, vh)
    return merge_heads(out)


# ------------------------------------- lane-offset grid (B, qblocks, heads)
def lane_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]          # [bq, hd]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def v_lane(q, k, v, block_q=512):
    return pl.pallas_call(
        lane_kernel,
        grid=(B, SQ // block_q, H),
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda bi, i, h: (bi, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SK, HD), lambda bi, i, h: (bi, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SK, HD), lambda bi, i, h: (bi, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, HD), lambda bi, i, h: (bi, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, SQ, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, SK, C)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, SK, C)), jnp.bfloat16)

    ref = None
    for name, fn in [
        ("current bq512", functools.partial(v_current, block_q=512)),
        ("current bq256", functools.partial(v_current, block_q=256)),
        ("current bq128", functools.partial(v_current, block_q=128)),
        ("batched-dg bq512", functools.partial(v_bdg, block_q=512)),
        ("batched-dg bq256", functools.partial(v_bdg, block_q=256)),
        ("lane-grid bq512", functools.partial(v_lane, block_q=512)),
        ("lane-grid bq1024", functools.partial(v_lane, block_q=1024)),
    ]:
        try:
            sec = timed(fn, (q, k, v))
            out = np.asarray(fn(q, k, v), np.float32)
            if ref is None:
                ref = out
            err = np.abs(out - ref).max()
            print(f"  {name:20s} {sec*1e6:9.1f} us {FLOPS/sec/1e12:7.2f} TF/s"
                  f"  maxdiff {err:.1e}", flush=True)
        except Exception as e:
            print(f"  {name:20s} FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    main()
