"""Ablate the heads-batched attention kernel to find where the time goes.

Variants:
  v2        — current kernel (single-pass softmax, divide in [bq,sk])
  defer     — normalize AFTER the PV matmul (divide in [bq,d] instead)
  nosoftmax — matmuls only (upper bound of the tiling/DMA scheme)
  parallel  — v2 + dimension_semantics=(parallel, arbitrary)
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


def timed(fn, args, iters=50):
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


def make_kernel(variant, scale, n_heads):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        for h in range(n_heads):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if variant == "nosoftmax":
                p = logits.astype(v.dtype)
                o_ref[0, h] = jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
            elif variant == "defer":
                m = jnp.max(logits, axis=-1, keepdims=True)
                e = jnp.exp(logits - m)
                s = jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[0, h] = (o * (1.0 / s)).astype(o_ref.dtype)
            else:
                m = jnp.max(logits, axis=-1, keepdims=True)
                e = jnp.exp(logits - m)
                s = jnp.sum(e, axis=-1, keepdims=True)
                p = (e / s).astype(v.dtype)
                o_ref[0, h] = jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return kernel


def run(variant, q, k, v, block_q, parallel=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / np.sqrt(d)
    grid = (b, sq // block_q)
    kw = {}
    if parallel:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    f = pl.pallas_call(
        make_kernel(variant, scale, h),
        grid=grid,
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
        **kw,
    )
    return f(q, k, v)


def bench(b, h, sq, sk, d, iters=50):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
    flops = 4 * b * h * sq * sk * d
    print(f"shape b={b} h={h} sq={sq} sk={sk} d={d}")
    for name, fn in [
        ("v2 bq512", functools.partial(run, "v2", block_q=512)),
        ("v2 bq1024(whole)", functools.partial(run, "v2", block_q=min(1024, sq))),
        ("defer bq512", functools.partial(run, "defer", block_q=512)),
        ("nosoftmax bq512", functools.partial(run, "nosoftmax", block_q=512)),
        ("v2 bq512 parallel", functools.partial(run, "v2", block_q=512, parallel=True)),
        ("defer bq512 parallel", functools.partial(run, "defer", block_q=512, parallel=True)),
        ("nosoftmax bq512 parallel", functools.partial(run, "nosoftmax", block_q=512, parallel=True)),
    ]:
        try:
            sec = timed(lambda q_, k_, v_: fn(q_, k_, v_), (q, k, v), iters)
            print(f"  {name:28s} {sec*1e6:9.1f} us  {flops/sec/1e12:7.2f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"  {name:28s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    bench(32, 6, 1024, 1024, 64)
    bench(64, 6, 1024, 1024, 64)
