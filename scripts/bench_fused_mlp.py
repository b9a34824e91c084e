"""Fused MLP pallas kernel: fc1 -> exact GELU -> fc2 with the erf VPU work
software-pipelined against MXU passes via hidden-dim chunking.

Numerics replicate the XLA op sequence: fc1 output cast to bf16, exact
(erf) GELU evaluated in f32 on the bf16 values, cast back to bf16 for fc2,
f32 accumulation.
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


def _erf(z):
    """Abramowitz-Stegun 7.1.26 minimax erf (f32, max abs error 1.5e-7 —
    below bf16 output resolution). Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, chunk, hidden):
    x = x_ref[...]                       # [bq, d]
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for c0 in range(0, hidden, chunk):
        h = jax.lax.dot_general(
            x, w1_ref[:, c0:c0 + chunk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = (h + b1_ref[0, c0:c0 + chunk][None, :]).astype(jnp.bfloat16)
        g = _gelu_exact(h.astype(jnp.float32))
        acc = acc + jax.lax.dot_general(
            g.astype(jnp.bfloat16), w2_ref[c0:c0 + chunk, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b2_ref[0][None, :]).astype(o_ref.dtype)


def fused_mlp(x, w1, b1, w2, b2, block_m=512, chunk=512):
    m, d = x.shape
    hidden = w1.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(mlp_kernel, chunk=chunk, hidden=hidden),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
    )(x, w1, b1, w2, b2)
    return out[:m]


def xla_mlp(x, w1, b1, w2, b2):
    h = (jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + b1[0][None, :]).astype(jnp.bfloat16)
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
    return (jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b2[0][None, :]).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    M, D, H = 32 * 1025, 384, 1536
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(1, D)) * 0.01, jnp.bfloat16)

    sec_x = timed(lambda a, *r: xla_mlp(a, *r), (x, w1, b1, w2, b2))
    print(f"XLA mlp (exact gelu): {sec_x*1e3:7.2f} ms", flush=True)
    for bm, ck in [(512, 512), (512, 256), (1024, 512), (256, 512), (512, 768)]:
        try:
            sec = timed(lambda a, *r: fused_mlp(a, *r, block_m=bm, chunk=ck),
                        (x, w1, b1, w2, b2))
            d = np.abs(np.asarray(xla_mlp(x, w1, b1, w2, b2), np.float32)
                       - np.asarray(fused_mlp(x, w1, b1, w2, b2, bm, ck),
                                    np.float32)).max()
            print(f"fused bm={bm} chunk={ck}: {sec*1e3:7.2f} ms  maxdiff {d:.2e}",
                  flush=True)
        except Exception as e:
            print(f"fused bm={bm} chunk={ck}: FAILED {str(e)[:140]}")


if __name__ == "__main__":
    main()
