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


from vit_ed_tpu.ops.gelu import _SQRT_HALF, erfc_bf16


def _gelu_bf16(h):
    """gelu_exact's exact bf16 op chain (ops/gelu.py:137-139)."""
    sqrt_half = jnp.asarray(_SQRT_HALF, jnp.bfloat16)
    return (0.5 * h) * erfc_bf16(-h * sqrt_half)


def _act(g, kind):
    if kind == "exact":
        return _gelu_bf16(g)
    if kind == "tanh":
        return jax.nn.gelu(g, approximate=True)
    return g


def mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, chunk, hidden,
               act="exact"):
    """Replicates the XLA (flax Dense) op sequence exactly: dot output
    rounded to bf16, bias added in bf16, the bit-exact GELU chain, second
    dot rounded to bf16, bias in bf16."""
    x = x_ref[...]                       # [bq, d]
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for c0 in range(0, hidden, chunk):
        h = jax.lax.dot_general(
            x, w1_ref[:, c0:c0 + chunk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h.astype(jnp.bfloat16) + b1_ref[0, c0:c0 + chunk][None, :]
        g = _act(h, act)
        acc = acc + jax.lax.dot_general(
            g, w2_ref[c0:c0 + chunk, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype) + b2_ref[0][None, :]


def fused_mlp(x, w1, b1, w2, b2, block_m=512, chunk=512, act="exact"):
    m, d = x.shape
    hidden = w1.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(mlp_kernel, chunk=chunk, hidden=hidden, act=act),
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
    """The model's actual MLP path: flax Dense (bf16-out dot + bf16 bias)
    with the bit-exact fast GELU (models/layers.py::Mlp)."""
    h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ()))) + b1[0][None, :]
    g = _gelu_bf16(h)
    return jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ()))) + b2[0][None, :]


def main():
    rng = np.random.default_rng(0)
    M, D, H = 64 * 1025, 384, 1536
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(1, D)) * 0.01, jnp.bfloat16)

    gflop = 2 * 2 * M * D * H / 1e9
    sec_x = timed(lambda a, *r: xla_mlp(a, *r), (x, w1, b1, w2, b2))
    print(f"XLA mlp (exact gelu): {sec_x*1e3:7.2f} ms  "
          f"({gflop/sec_x/1e3:5.1f} TF/s)", flush=True)
    ref = np.asarray(xla_mlp(x, w1, b1, w2, b2), np.float32)
    for bm, ck, act in [(512, 1536, "exact"), (512, 1536, "none"),
                        (512, 1536, "tanh"), (256, 1536, "exact"),
                        (1024, 1536, "exact"), (128, 1536, "exact"),
                        (512, 768, "none")]:
        try:
            sec = timed(lambda a, *r: fused_mlp(a, *r, block_m=bm, chunk=ck,
                                                act=act),
                        (x, w1, b1, w2, b2))
            got = np.asarray(fused_mlp(x, w1, b1, w2, b2, bm, ck, act),
                             np.float32)
            d = np.abs(ref - got).max()
            neq = int((ref != got).sum())
            print(f"fused bm={bm} chunk={ck} act={act}: {sec*1e3:7.2f} ms  "
                  f"({gflop/sec/1e3:5.1f} TF/s)  maxdiff {d:.2e}  "
                  f"neq {neq}/{ref.size}", flush=True)
        except Exception as e:
            print(f"fused bm={bm} chunk={ck} act={act}: FAILED {str(e)[:140]}")


if __name__ == "__main__":
    main()
