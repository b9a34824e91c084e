"""Serving-bundle throughput: does the exported artifact decode at the
live rate?

Exports the flagship decode stage (score_row) from the bench model,
deserializes it, and times BOTH the live jitted call and the bundle
replay with bench.py's _timed_scan methodology (Exported.call is
traceable, so the bundle times under the same one-dispatch lax.scan —
same executable shape, same tunnel-sync rules). Expected: parity — the
artifact is the same XLA program; any gap is calling-convention
overhead.

Usage: python scripts/bench_serving.py [--config patch16_512]
       [--chunk 64] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import vit_ed_tpu  # noqa: E402,F401

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_train_step import CONFIGS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="patch16_512", choices=sorted(CONFIGS))
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="/tmp/vit_ed_serving_bundle")
    args = ap.parse_args()

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.serve import export_scorer, load_scorer, stage_fns

    cfg = CONFIGS[args.config]
    model = ViTED(img_size=cfg["img_size"], patch_size=cfg["patch_size"],
                  num_classes=cfg["num_classes"], embed_dim=cfg["embed_dim"],
                  depth=cfg["depth"], c_depth=cfg["c_depth"],
                  num_heads=cfg["num_heads"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = cfg["img_size"]
    params = model.init(rng, jnp.zeros((1, 2, img, img, 3)))["params"]
    fns = stage_fns(model)

    print(f"exporting {args.config} bundle (score_row, chunk {args.chunk})",
          file=sys.stderr)
    t0 = time.time()
    export_scorer(model, params, args.out, stages=("score_row",),
                  batch_sizes=[args.chunk])
    print(f"export took {time.time() - t0:.1f}s", file=sys.stderr)
    scorer = load_scorer(args.out)

    # setup runs jitted: un-jitted model.apply would dispatch op-by-op
    # over the remote tunnel (the pathology _timed_scan exists to avoid)
    nrng = np.random.default_rng(0)
    x1 = jnp.asarray(nrng.normal(size=(args.chunk, img, img, 3)), jnp.float32)
    feats = jax.jit(fns["encode"])(params, x1)
    kv = jax.jit(fns["kv"])(params, feats)
    kv_row = jax.tree.map(lambda a: a[:, :1], kv)
    tokens = jax.jit(fns["prepare"])(params, x1)

    live = jax.jit(lambda kvr, t: fns["score_row"](params, kvr, t))
    sec_live = _timed_scan(lambda t, kvr: live(kvr, t), (tokens, kv_row),
                           args.iters)

    exp = scorer._exported["score_row"][0]
    bundle = jax.jit(lambda kvr, t: exp.call(scorer.params, kvr, t))
    sec_bundle = _timed_scan(lambda t, kvr: bundle(kvr, t),
                             (tokens, kv_row), args.iters)

    r_live = args.chunk / sec_live
    r_bundle = args.chunk / sec_bundle
    print(f"{args.config} chunk {args.chunk}: live {r_live:,.0f} pairs/s | "
          f"bundle {r_bundle:,.0f} pairs/s | ratio {r_bundle / r_live:.3f}")


if __name__ == "__main__":
    main()
