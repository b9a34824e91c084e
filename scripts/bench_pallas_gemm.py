"""Isolate the Mosaic GEMM rate at the decode-MLP shapes.

bench_fused_mlp.py measured the fused fc1+fc2 kernel at 64.8 TF/s with
the activation removed, far below XLA's 106-148 TF/s plain-GEMM
calibration — this script times a single pallas matmul at the same
shapes (M=65600, D=384, H=1536) against jnp.dot to find out whether
Mosaic dots are structurally slower here or the fused kernel's loop is.
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


def timed(fn, args, iters=20):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            return jnp.sum(fn(xi, *rest).astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def gemm_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def pallas_gemm(x, w, block_m=512, out_dtype=jnp.bfloat16, semantics=None):
    m, d = x.shape
    n = w.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))
    out = pl.pallas_call(
        functools.partial(gemm_kernel, out_dtype=out_dtype),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        **kwargs,
    )(x, w)
    return out[:m]


def main():
    rng = np.random.default_rng(0)
    M, D, H = 64 * 1025, 384, 1536
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, jnp.bfloat16)
    xh = jnp.asarray(rng.normal(size=(M, H)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, jnp.bfloat16)

    for name, a, w in [("fc1 (K=384,N=1536)", x, w1),
                       ("fc2 (K=1536,N=384)", xh, w2)]:
        gflop = 2 * a.shape[0] * a.shape[1] * w.shape[1] / 1e9
        sec = timed(lambda p, q: jnp.dot(p, q), (a, w))
        print(f"XLA  {name}: {sec*1e3:7.2f} ms ({gflop/sec/1e3:6.1f} TF/s)",
              flush=True)
        for bm in (512, 2048):
            for sem in (None, "parallel", "arbitrary"):
                try:
                    sec = timed(lambda p, q: pallas_gemm(p, q, bm,
                                                         semantics=sem), (a, w))
                    print(f"plls {name} bm={bm} sem={sem}: {sec*1e3:7.2f} ms "
                          f"({gflop/sec/1e3:6.1f} TF/s)", flush=True)
                except Exception as e:
                    print(f"plls {name} bm={bm} sem={sem}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
