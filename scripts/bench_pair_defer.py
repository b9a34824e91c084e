"""Pair kernel variant: defer softmax normalization to after PV."""

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

from vit_ed_tpu.ops.attention import _pair_forward


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


def defer_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane >= 64, k, jnp.zeros_like(k))

    def head_exp(k_masked):
        logits = jax.lax.dot_general(
            q, k_masked, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        return e.astype(v.dtype), s

    e0, s0 = head_exp(k_lo)
    e1, s1 = head_exp(k_hi)
    d0 = jax.lax.dot_general(e0, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * (1.0 / s0)
    d1 = jax.lax.dot_general(e1, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * (1.0 / s1)
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o_ref[0] = jnp.where(olane < 64, d0, d1).astype(o_ref.dtype)


def defer_forward(q, k, v, scale):
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128
    n_blocks = -(-sq // 512)
    block_q = _round_up(-(-sq // n_blocks), 8)
    sq_pad = block_q * n_blocks
    sk_pad = _round_up(max(sk, 8), 8)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
    out = pl.pallas_call(
        functools.partial(defer_kernel, scale=scale, kv_len=sk),
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
        interpret=False,
    )(q, k, v)
    return out[:, :sq, :]


def main():
    rng = np.random.default_rng(0)
    for SQ, SK in [(1024, 1024), (1025, 1024), (1025, 1025)]:
        q = jnp.asarray(rng.normal(size=(32, SQ, 384)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(32, SK, 384)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(32, SK, 384)), jnp.bfloat16)
        flops = 4 * 32 * 6 * SQ * SK * 64
        try:
            sec_c = timed(lambda a, b_, c_: _pair_forward(a, b_, c_, 0.125),
                          (q, k, v))
            sec_d = timed(lambda a, b_, c_: defer_forward(a, b_, c_, 0.125),
                          (q, k, v))
            a1 = np.asarray(_pair_forward(q, k, v, 0.125), np.float32)
            a2 = np.asarray(defer_forward(q, k, v, 0.125), np.float32)
            print(f"Sq={SQ} Sk={SK}: current {sec_c*1e6:8.1f}us "
                  f"({flops/sec_c/1e12:5.2f}) defer {sec_d*1e6:8.1f}us "
                  f"({flops/sec_d/1e12:5.2f})  maxdiff {np.abs(a1-a2).max():.2e}",
                  flush=True)
        except Exception as e:
            print(f"Sq={SQ}: FAILED {str(e)[:150]}")


if __name__ == "__main__":
    main()
