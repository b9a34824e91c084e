"""End-to-end patch16_512 decode rate vs pair-batch size."""

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

from vit_ed_tpu.models.vit_ed import ViTED


def timed(fn, args, iters=20):
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


def main():
    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]

    n = 4
    feats = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                             forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                              method=model.prepare_x2))(params, x[:, 1])

    # FLOPs per pair (decoder only): 12 blocks x (self-attn + cross-attn + mlp)
    GF = 96.7

    for batch in [32, 64, 128, 256]:
        pi = jnp.asarray(rng.integers(0, n, size=batch), jnp.int32)
        pj = jnp.asarray(rng.integers(0, n, size=batch), jnp.int32)
        try:
            sec = timed(
                lambda f, p, t, i, j: model.apply(
                    {"params": p}, jnp.take(f, i, axis=0), jnp.take(t, j, axis=0),
                    method=model.score_tokens),
                (feats, params, tokens, pi, pj))
            rate = batch / sec
            print(f"batch {batch:4d}: {rate:8.1f} pairs/s  "
                  f"({rate * GF / 1000:6.1f} TF/s effective, "
                  f"{rate * GF / 1000 / 197 * 100:4.1f}% MFU)", flush=True)
        except Exception as e:
            print(f"batch {batch:4d}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
