"""Attention kernel micro-benchmark: Pallas block-size sweep vs XLA.

Run on the TPU to pick DEFAULT_BLOCK_Q / validate the fused kernel against
the XLA path on the shapes that matter (ViT-ED self + cross attention).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.ops.attention import fused_attention


def timed(fn, x, extra, iters=50):
    def multi(n, x, *extra):
        def body(acc, _):
            xi = x + acc.astype(x.dtype) * 1e-24
            out = fn(xi, *extra)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return acc

    j = jax.jit(multi, static_argnums=0)
    np.asarray(j(iters, x, *extra))
    t0 = time.time()
    np.asarray(j(iters, x, *extra))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("self  p16_512", 32, 6, 1024, 1024, 64),
        ("cross p16_512", 32, 6, 1025, 1024, 64),
        ("self  p8_64  ", 256, 12, 64, 64, 32),
    ]
    for name, b, h, sq, sk, d in shapes:
        q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.bfloat16)
        flops = 4 * b * h * sq * sk * d
        t = timed(functools.partial(fused_attention, use_pallas=False), q, (k, v))
        print(f"{name} xla        : {t * 1e3:7.3f} ms {flops / t / 1e12:6.1f} TF/s")
        for bq in (128, 256, 512):
            t = timed(functools.partial(fused_attention, block_q=bq,
                                        use_pallas=True), q, (k, v))
            print(f"{name} pallas bq{bq:<4}: {t * 1e3:7.3f} ms "
                  f"{flops / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
