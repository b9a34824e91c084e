"""Micro-benchmark: native (C++) input pipeline vs the PIL + numpy chain.

Measures the deterministic numeric tail of sample preparation (the part
transforms.py dispatches to native/pipeline.cc) on synthetic images.
Single-thread comparison — the PipelinePool adds thread-level scaling on
multi-core production hosts on top of these per-op wins (this benchmark
also reports the pool at the host's core count for completeness).

Usage: python scripts/bench_native_pipeline.py [--iters N]
"""

import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vit_ed_tpu.data import transforms as T  # noqa: E402
from vit_ed_tpu.native import pipeline as npipe  # noqa: E402


def timeit(fn, iters):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    if not npipe.is_available():
        print("native pipeline unavailable (no g++?)")
        return

    rng = np.random.default_rng(0)
    rows = []

    # 1. flagship eval prep: resize to 512 shorter side + normalize
    arr = rng.integers(0, 256, (700, 900, 3), np.uint8)
    pil = Image.fromarray(arr)

    def py_eval():
        img = T.resize(pil, (512, 512))
        return T.normalize(T.to_tensor(img))

    def nat_eval():
        return npipe.prep(arr, (512, 512))

    rows.append(("eval prep 700x900->512 (resize+normalize)",
                 timeit(py_eval, args.iters), timeit(nat_eval, args.iters)))

    # 2. fused to_tensor + normalize only
    arr2 = rng.integers(0, 256, (512, 512, 3), np.uint8)
    pil2 = Image.fromarray(arr2)
    rows.append(("to_tensor+normalize 512^2",
                 timeit(lambda: T.normalize(T.to_tensor(pil2)), args.iters),
                 timeit(lambda: npipe.normalize_u8(arr2), args.iters)))

    # 3. puzzle piece prep: center crop 60 of 64 + normalize
    arr3 = rng.integers(0, 256, (64, 64, 3), np.uint8)
    pil3 = Image.fromarray(arr3)
    it3 = args.iters * 20
    rows.append(("piece prep 64^2 (crop60+normalize)",
                 timeit(lambda: T.normalize(T.to_tensor(T.center_crop(pil3, 60))), it3),
                 timeit(lambda: npipe.prep(arr3, (60, 60), crop=(2, 2, 60, 60)), it3)))

    # 4. white percentage (CustomRandomCrop inner loop)
    arr4 = rng.integers(180, 256, (512, 512, 3), np.uint8)
    pil4 = Image.fromarray(arr4)

    def py_wp():
        gray = pil4.convert("L").resize((224, 224))
        a = np.asarray(gray)
        return float(np.sum(a > 250)) / a.size

    rows.append(("white percentage 512^2",
                 timeit(py_wp, args.iters),
                 timeit(lambda: npipe.white_percentage(arr4), args.iters)))

    # 5. batched prep through the pool (per-image time)
    imgs = [rng.integers(0, 256, (700, 900, 3), np.uint8) for _ in range(8)]
    with npipe.PipelinePool() as pool:
        t_pool = timeit(lambda: pool.prep_batch(imgs, (512, 512)),
                        max(args.iters // 4, 3)) / len(imgs)
    rows.append((f"pool prep/image (batch 8, {pool.num_threads} threads)",
                 timeit(py_eval, args.iters), t_pool))

    print(f"{'case':50s} {'python':>10s} {'native':>10s} {'speedup':>8s}")
    for name, t_py, t_c in rows:
        print(f"{name:50s} {t_py * 1e3:8.2f}ms {t_c * 1e3:8.2f}ms "
              f"{t_py / t_c:7.2f}x")


if __name__ == "__main__":
    main()
