"""int8 feasibility probes: XLA int8 GEMM rate, int8 pallas attention rate."""

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


def timed(fn, args, iters=30):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype)
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-24, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def bench_gemm(m, k, n, dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, size=(m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, size=(k, n)), jnp.int8)
        pt = jnp.int32
    else:
        a = jnp.asarray(rng.normal(size=(m, k)), dtype)
        b = jnp.asarray(rng.normal(size=(k, n)), dtype)
        pt = jnp.float32

    def f(a_, b_):
        return jax.lax.dot_general(a_, b_, (((1,), (0,)), ((), ())),
                                   preferred_element_type=pt)

    sec = timed(f, (a, b))
    flops = 2 * m * k * n
    print(f"  XLA [{m},{k}]@[{k},{n}] {np.dtype(dtype).name:8s} "
          f"{sec*1e6:9.1f} us {flops/sec/1e12:7.2f} T/s", flush=True)


# int8 heads-batched attention: int8 QK -> int32 logits -> f32 softmax ->
# int8 probs (scaled by 127) -> int8 PV -> scaled f32 out
def int8_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads):
    for h in range(n_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        p = jnp.round(e * (127.0 / s)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[0, h] = (acc.astype(jnp.float32) * (1.0 / 127.0)).astype(o_ref.dtype)


def int8_attention(q, k, v, scale, block_q=512):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    return pl.pallas_call(
        functools.partial(int8_kernel, scale=scale, n_heads=h),
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
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
    )(q, k, v)


def main():
    print("GEMM rates (decoder shapes, M=32*1025):")
    M = 32 * 1025
    for dt in (jnp.bfloat16, jnp.int8):
        bench_gemm(M, 384, 1536, dt)
        bench_gemm(M, 1536, 384, dt)
        bench_gemm(M, 384, 1152, dt)

    print("attention (32,6,1024,1024,64):")
    B, H, SQ, SK, HD = 32, 6, 1024, 1024, 64
    rng = np.random.default_rng(0)
    qi = jnp.asarray(rng.integers(-127, 127, size=(B, H, SQ, HD)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 127, size=(B, H, SK, HD)), jnp.int8)
    vi = jnp.asarray(rng.integers(-127, 127, size=(B, H, SK, HD)), jnp.int8)
    flops = 4 * B * H * SQ * SK * HD
    try:
        sec = timed(lambda q, k, v: int8_attention(q, k, v, 1e-4), (qi, ki, vi))
        print(f"  pallas int8 attention  {sec*1e6:9.1f} us {flops/sec/1e12:7.2f} T/s",
              flush=True)
    except Exception as e:
        print(f"  pallas int8 attention FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
