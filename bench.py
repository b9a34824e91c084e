"""Benchmark: pair-forwards/sec/chip on the flagship ViT-ED configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: decoder pair scores per second per chip at patch16_512
(the inner op of the sharded O(N^2) HisFrag retrieval scan — encoder
features and stream-2 tokens amortised, cross-decoder per pair), measured
against the 5,000 pair-forwards/sec/chip north star in BASELINE.md. A full
pair-forward (encode + decode) figure and the CPU-runnable patch8_64
configuration are reported as secondary metrics on stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_pair_forwards(img_size, patch_size, depth, c_depth, embed_dim, num_heads,
                        num_classes, batch, warmup=3, iters=10):
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=img_size, patch_size=patch_size, num_classes=num_classes,
                  embed_dim=embed_dim, depth=depth, c_depth=c_depth,
                  num_heads=num_heads, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 2, img_size, img_size, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]

    # full pair forward (encode + decode + head)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    for _ in range(warmup):
        out = fwd(params, x)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, x)
    out.block_until_ready()
    full_rate = iters * batch / (time.time() - t0)

    # decode-only pair score (the O(N^2) scan inner op): encoder features
    # and x2 tokens precomputed once
    feats = jax.jit(lambda p, a: model.apply({"params": p}, a, forward_first_part=True))(
        params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply({"params": p}, a, method=model.prepare_x2))(
        params, x[:, 1])
    n = feats.shape[0]
    pi = jnp.asarray(rng.integers(0, n, size=batch), jnp.int32)
    pj = jnp.asarray(rng.integers(0, n, size=batch), jnp.int32)

    score = jax.jit(lambda p, f, t, i, j: model.apply(
        {"params": p}, jnp.take(f, i, axis=0), jnp.take(t, j, axis=0),
        method=model.score_tokens))
    for _ in range(warmup):
        out = score(params, feats, tokens, pi, pj)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = score(params, feats, tokens, pi, pj)
    out.block_until_ready()
    decode_rate = iters * batch / (time.time() - t0)

    return full_rate, decode_rate


def main():
    n_chips = max(len(jax.devices()), 1)

    full_512, decode_512 = bench_pair_forwards(
        img_size=512, patch_size=16, depth=12, c_depth=12, embed_dim=384,
        num_heads=6, num_classes=1, batch=32)
    print(f"patch16_512: full={full_512 / n_chips:.1f} "
          f"decode-only={decode_512 / n_chips:.1f} pair-fwd/s/chip", file=sys.stderr)

    try:
        full_64, decode_64 = bench_pair_forwards(
            img_size=64, patch_size=8, depth=8, c_depth=8, embed_dim=384,
            num_heads=12, num_classes=4, batch=256)
        print(f"patch8_64:  full={full_64 / n_chips:.1f} "
              f"decode-only={decode_64 / n_chips:.1f} pair-fwd/s/chip", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"patch8_64 bench failed: {e}", file=sys.stderr)

    value = decode_512 / n_chips
    print(json.dumps({
        "metric": "pair-scores/sec/chip (patch16_512, decode-only scan op)",
        "value": round(value, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
