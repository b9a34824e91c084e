"""Forward+backward attention cost: packed (transposing VJP) vs 4-D path."""

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

from vit_ed_tpu.ops.attention import fused_attention, fused_attention_packed


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


def split(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


def merge(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def main():
    rng = np.random.default_rng(0)
    H = 6
    for B, SQ, SK in [(20, 1024, 1024), (20, 1025, 1024)]:
        q = jnp.asarray(rng.normal(size=(B, SQ, 384)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, SK, 384)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, SK, 384)), jnp.bfloat16)

        def loss_packed(q_, k_, v_):
            return jnp.sum(fused_attention_packed(q_, k_, v_, H,
                                                  use_pallas=True) ** 2)

        def loss_old(q_, k_, v_):
            return jnp.sum(merge(fused_attention(split(q_, H), split(k_, H),
                                                 split(v_, H),
                                                 use_pallas=True)) ** 2)

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))
        go = jax.grad(loss_old, argnums=(0, 1, 2))
        sec_p = timed(lambda a, b_, c_: gp(a, b_, c_)[0], (q, k, v))
        sec_o = timed(lambda a, b_, c_: go(a, b_, c_)[0], (q, k, v))
        print(f"B={B} Sq={SQ} Sk={SK} fwd+bwd: packed {sec_p*1e3:7.2f} ms  "
              f"4-D path {sec_o*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
