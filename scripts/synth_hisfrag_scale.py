#!/usr/bin/env python
"""Synthesize a HisFrag-shaped dataset at retrieval scale.

The real HisFrag20 corpus (reference hisfrag.py:161-302 scans N~20k test
fragments, O(N^2) pairs) is not available in this environment; this script
manufactures a dataset with the same file-name contract
(``w{writer}_{page}_{frag}.jpg``) and manuscript-like statistics so the
signature sharded scan can be demonstrated end-to-end at meaningful N.

Round-5 demonstration (docs/PERFORMANCE.md "signature scan" section) used
the defaults: 250 writers x 2 pages x 4 fragments = 2,000 test fragments
-> 2,001,000 pairs through ``hisfrag.py --mode test``.

Usage:
    python scripts/synth_hisfrag_scale.py --root /tmp/hisfrag2k \
        [--writers 250] [--pages 2] [--frags 4] [--size 704]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image


def frag(rng: np.random.Generator, size: int = 704) -> Image.Image:
    """Manuscript-ish texture: smooth parchment base + stroke-scale noise."""
    base = rng.integers(150, 230, (size // 16, size // 16, 3), dtype=np.uint8)
    img = np.asarray(
        Image.fromarray(base).resize((size, size), Image.BILINEAR), np.int16)
    img = img + rng.integers(-35, 35, (size, size, 1), dtype=np.int16)
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--writers", type=int, default=250)
    ap.add_argument("--pages", type=int, default=2)
    ap.add_argument("--frags", type=int, default=4)
    ap.add_argument("--size", type=int, default=704)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    os.makedirs(f"{args.root}/train", exist_ok=True)
    os.makedirs(f"{args.root}/test", exist_ok=True)

    # small train split so --mode train/test plumbing both work
    for w in range(4):
        for p in range(2):
            for f in range(2):
                frag(rng, 640).save(
                    f"{args.root}/train/w{w:03d}_{p}_{f}.jpg", quality=85)

    n = 0
    for w in range(args.writers):
        for p in range(args.pages):
            for f in range(args.frags):
                frag(rng, args.size).save(
                    f"{args.root}/test/w{w:03d}_{p}_{f}.jpg", quality=85)
                n += 1
    pairs = n * (n + 1) // 2
    print(f"{n} test fragments ({pairs:,} scan pairs) "
          f"in {time.time() - t0:.0f}s -> {args.root}")


if __name__ == "__main__":
    main()
