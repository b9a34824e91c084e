"""int8 decode A/B across model scales: S (embed 384), B (768), L (1024).

Round 3 removed TPU.INT8_SCORE on a ViT-S measurement (quant/dequant
overhead ate the MXU win at C=384). That refusal was extrapolated outside
its regime: pjs-L decode runs HBM-pressured at 26.1% MFU where int8
halves both the GEMM bytes and the resident weight footprint, and the
relative quant overhead shrinks ~(1024/384)x. This measures the SAME
row-sharded decode schedule (score_tokens_row, the O(N^2) scan inner op)
with bf16 vs dynamic-int8 GEMMs (ops/quant.py) at all three widths on the
real chip, so the keep/retire decision is per-shape data, not a ViT-S
extrapolation. Reference role: the fused SDPA + projection stack of
/root/reference/models/vision_transformer.py:63-66 at deployment time.

Usage: python scripts/bench_int8_scale.py [--sizes S B L] [--batch 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np

# (embed, depth, c_depth, heads, decode GF/pair) — GF from the schedule
# accounting in bench.py / bench_vitb.py / bench_pjsl.py
SIZES = {
    "S": (384, 12, 12, 6, 80.1),
    "B": (768, 12, 12, 12, 252.8),
    "L": (1024, 24, 24, 16, 419.3),
}


def bench_size(name, batch, peak_tf=197.0):
    from vit_ed_tpu.models.vit_ed import ViTED

    embed, depth, c_depth, heads, gf = SIZES[name]
    model = ViTED(img_size=512, patch_size=16, num_classes=1,
                  embed_dim=embed, depth=depth, c_depth=c_depth,
                  num_heads=heads, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg = 8
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]

    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_row = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats[:1])
    pj = jnp.asarray(rng.integers(0, nimg, size=batch), jnp.int32)

    rows = {}
    for tag, m in (("bf16", model), ("int8", model.clone(int8_gemm=True))):
        t = _timed_scan(
            lambda t, p, kv, j, _m=m: _m.apply(
                {"params": p}, kv, jnp.take(t, j, axis=0),
                method=_m.score_tokens_row),
            (tokens, params, kv_row, pj), 10)
        rate = batch / t.best
        rows[tag] = rate
        print(f"pjs-{name} decode {tag}: {rate:.1f} pairs/s "
              f"(spread {t.spread_pct:.1f}%; {gf} GF/pair -> "
              f"{rate * gf / 1000:.1f} TF/s effective, "
              f"{rate * gf / 1000 / peak_tf * 100:.1f}% bf16-peak MFU)",
              flush=True)
    print(f"pjs-{name} int8/bf16 ratio: {rows['int8'] / rows['bf16']:.3f}",
          flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", default=["S", "B", "L"],
                    choices=list(SIZES))
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    for s in args.sizes:
        bench_size(s, args.batch)


if __name__ == "__main__":
    main()
