"""Compare attention implementations at the patch16_512 decode shapes.

Variants: in-repo fused_attention (heads-batched Pallas), XLA reference,
stock jax.experimental flash_attention at several block sizes. Rates in
TF/s using 4*b*h*sq*sk*d FLOPs.
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

from vit_ed_tpu.ops.attention import fused_attention, reference_attention


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


def bench_shape(b, h, sq, sk, d, iters=50):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
    flops = 4 * b * h * sq * sk * d

    def report(name, sec):
        print(f"  {name:40s} {sec*1e6:9.1f} us  {flops/sec/1e12:7.2f} TF/s",
              flush=True)

    print(f"shape b={b} h={h} sq={sq} sk={sk} d={d}")
    report("repo fused_attention (pallas v2)",
           timed(lambda q_, k_, v_: fused_attention(q_, k_, v_, use_pallas=True),
                 (q, k, v), iters))
    report("XLA reference", timed(reference_attention, (q, k, v), iters))

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        for bq, bkm, bk in [(512, 512, 512), (512, 1024, 512), (256, 512, 256),
                            (1024, 1024, 512)]:
            if sq % 128 or sk % bkm or bkm % bk:
                continue
            bs = BlockSizes(block_q=min(bq, sq), block_k_major=bkm, block_k=bk,
                            block_b=1,
                            block_q_major_dkv=min(bq, sq), block_k_major_dkv=bkm,
                            block_k_dkv=bk, block_q_dkv=min(bq, sq),
                            block_k_major_dq=bkm, block_k_dq=bk,
                            block_q_dq=min(bq, sq))
            fa = functools.partial(flash_attention, causal=False,
                                   sm_scale=1.0 / np.sqrt(d), block_sizes=bs)
            report(f"stock flash bq{bq} bkm{bkm} bk{bk}",
                   timed(fa, (q, k, v), iters))
    except Exception as e:
        print(f"  stock flash failed: {e}")


if __name__ == "__main__":
    bench_shape(32, 6, 1024, 1024, 64)
    bench_shape(32, 6, 1152, 1024, 64)   # cross shape (1025 padded)
    bench_shape(64, 6, 1024, 1024, 64)
