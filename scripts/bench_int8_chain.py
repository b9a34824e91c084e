"""Chained-GEMM int8 vs bf16 rate at decoder shapes (sum amortized)."""

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

M = 32 * 1025
REPS = 12


def timed(fn, args, iters=20):
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


def chain_bf16(x, w1, w2):
    for _ in range(REPS):
        y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x


def chain_int8(x, w1, w2):
    for _ in range(REPS):
        y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = (y >> 7).astype(jnp.int8)
        x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = (x >> 7).astype(jnp.int8)
    return x


def main():
    rng = np.random.default_rng(0)
    flops = REPS * 2 * 2 * M * 384 * 1536

    xb = jnp.asarray(rng.normal(size=(M, 384)), jnp.bfloat16)
    w1b = jnp.asarray(rng.normal(size=(384, 1536)) * 0.05, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(1536, 384)) * 0.05, jnp.bfloat16)
    sec = timed(chain_bf16, (xb, w1b, w2b))
    print(f"bf16 mlp chain: {sec*1e3:8.2f} ms  {flops/sec/1e12:7.1f} TF/s")

    xi = jnp.asarray(rng.integers(-8, 8, size=(M, 384)), jnp.int8)
    w1i = jnp.asarray(rng.integers(-8, 8, size=(384, 1536)), jnp.int8)
    w2i = jnp.asarray(rng.integers(-8, 8, size=(1536, 384)), jnp.int8)
    sec = timed(chain_int8, (xi, w1i, w2i))
    print(f"int8 mlp chain: {sec*1e3:8.2f} ms  {flops/sec/1e12:7.1f} TOP/s")


if __name__ == "__main__":
    main()
