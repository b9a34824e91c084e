"""Batch-size sweep for the patch8_64 (puzzle) configuration.

The reference trains this config at batch 1024 (README.md:27); this sweep
finds the throughput-optimal scoring batch for the small-image model,
where per-dispatch overheads and sub-MXU GEMM shapes dominate at small
batch. Uses bench.py's timed-scan harness.

Usage: python scripts/bench_patch8_batch.py [--batches 256,512,1024,2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import bench_pair_forwards  # noqa: E402  (sets up the jax cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512,1024,2048")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    for b in [int(s) for s in args.batches.split(",")]:
        try:
            full, decode = bench_pair_forwards(
                img_size=64, patch_size=8, depth=8, c_depth=8, embed_dim=384,
                num_heads=12, num_classes=4, batch=b, iters=args.iters)
        except Exception as e:
            print(f"batch {b}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        print(f"batch {b:5d}: full {full:8.1f}  decode {decode:8.1f} pairs/s",
              flush=True)


if __name__ == "__main__":
    main()
