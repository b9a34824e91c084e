"""pjs-Base (ViT-B scale) datapoint: decode + full pair-forward rates.

The reference only ships ViT-S pjs configs; this measures the framework
at the next scale up (embed 768, 12 heads, head_dim 64 — the packed
kernels' native geometry) to show the row-sharded schedule and kernels
hold beyond ViT-S. Decode GF/pair scales ~4x (GEMMs ~C^2).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=768,
                  depth=12, c_depth=12, num_heads=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg, batch = 8, 32
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]

    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_row = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats[:1])
    pj = jnp.asarray(rng.integers(0, nimg, size=batch), jnp.int32)

    sec = _timed_scan(
        lambda t, p, kv, j: model.apply(
            {"params": p}, kv, jnp.take(t, j, axis=0),
            method=model.score_tokens_row),
        (tokens, params, kv_row, pj), 10)
    # Per-pair executed work, same schedule accounting as bench.py.
    # At C=384 the 80.1 GF splits into GEMM terms 46.25 (scale C^2:
    # blocks 1-10 full 10 x 4.231, block 0 w/o self 3.022, block 11 CLS
    # ~0.912) and attention terms 33.9 (scale C: 10 x 3.227 + block-0
    # cross 1.613 + block-11 CLS ~0.03). At C=768: 46.25*4 + 33.9*2 =
    # 252.8 GF/pair.
    gf = 252.8
    rate = batch / sec
    print(f"pjs-B patch16_512 decode: {rate:.1f} pairs/s "
          f"({gf} GF/pair -> {rate * gf / 1000:.1f} TF/s effective, "
          f"{rate * gf / 1000 / 197.0 * 100:.1f}% MFU)", flush=True)

    full = _timed_scan(lambda a, p: model.apply({"params": p}, a),
                       (x, params), 10)
    print(f"pjs-B full pair-forward: {nimg / full:.1f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
