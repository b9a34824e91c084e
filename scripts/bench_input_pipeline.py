"""Host input pipeline A/B: the flagship train transform, stage by stage.

Measures the per-sample cost of HisfragTrainer's train transform
(hisfrag.py::get_transforms) on THIS host, per stage, under three
implementations:

  native  decode + warps + jitter + normalize in C++ (current default)
  cv2     the round-3 state: native decode/jitter/normalize but
          cv2.warpAffine for the two warps (reconstructed inline)
  python  VIT_ED_NATIVE_PIPELINE=0 everywhere (numpy mirrors)

plus the loader-level view: samples/s single-thread vs threaded
DataLoader workers (the GIL-release claim — on a 1-core host threads
cannot add wall-clock, so the honest multi-worker evidence is the
measured GIL-released fraction, not a speedup).

Usage: python scripts/bench_input_pipeline.py [--iters 30] [--size 1000]
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.native import pipeline as npipe


def make_jpeg(size, seed=0):
    rng = np.random.default_rng(seed)
    # text-like structure (white page, dark strokes) so JPEG entropy is
    # realistic for HisFrag fragments
    arr = np.full((size, int(size * 0.8), 3), 235, np.uint8)
    for _ in range(200):
        y = rng.integers(0, size - 12)
        x = rng.integers(0, arr.shape[1] - 60)
        arr[y:y + rng.integers(2, 10), x:x + rng.integers(10, 60)] = \
            rng.integers(10, 90)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def timed(fn, iters):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--patch", type=int, default=512)
    args = ap.parse_args()

    try:
        import cv2
    except ImportError:
        cv2 = None

    data = make_jpeg(args.size)
    print(f"synthetic JPEG: {args.size}x{int(args.size * 0.8)}, "
          f"{len(data) / 1024:.0f} KiB; native pipeline: "
          f"{npipe.is_available()}", flush=True)

    img = T.open_rgb_bytes(data) if hasattr(T, "open_rgb_bytes") else \
        Image.fromarray(npipe.decode_jpeg(data))
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    m1 = T.rotation_matrix((w / 2, h / 2), 4.0, 1.0)
    m1[0, 2] += 0.05 * w
    m2 = T.rotation_matrix((w / 2, h / 2), 8.0, 1.05)

    import random as pyrandom

    rows = []

    def stage(name, fn):
        rows.append((name, timed(fn, args.iters)))

    # --- stages, current (native) path ---
    stage("decode (libjpeg C++)", lambda: npipe.decode_jpeg(data))
    stage("random_affine warp (native)",
          lambda: npipe.warp_affine(arr, m1, (0, 0, 0)))
    stage("shift_scale_rotate warp (native)",
          lambda: npipe.warp_affine(arr, m2, (0, 0, 0)))
    if cv2 is not None:
        stage("  [r03] warp via cv2",
              lambda: cv2.warpAffine(arr, m1, (w, h),
                                     borderMode=cv2.BORDER_CONSTANT,
                                     borderValue=(0, 0, 0)))
    stage("  [fallback] warp via numpy mirror",
          lambda: T._warp_affine_np(arr, m1, (0, 0, 0)))
    crop = img.crop((0, 0, args.patch, args.patch))
    stage("random_crop (PIL)",
          lambda: T.random_crop(img, args.patch, pad_if_needed=True))
    stage("color_jitter (native)",
          lambda: npipe.color_jitter(crop, [("brightness", 1.1),
                                            ("contrast", 0.9),
                                            ("saturation", 1.05),
                                            ("hue", 12)]))
    stage("GaussianBlur (native)",
          lambda: T.GaussianBlur(p=1.0, radius_min=1.5,
                                 radius_max=1.5)(crop))
    stage("normalize (native fused)", lambda: T.normalize_image(crop))

    # --- whole transform, as the trainer runs it ---
    def full(native):
        os.environ["VIT_ED_NATIVE_PIPELINE"] = "1" if native else "0"
        pyrandom.seed(0)
        im = Image.fromarray(arr)
        im = T.random_affine(im, degrees=5, translate=(0.1, 0.1), fill=0)
        im = T.shift_scale_rotate(im, shift_limit=0.05, scale_limit=0.1,
                                  rotate_limit=10, p=0.5,
                                  border_value=(0, 0, 0))
        im = T.random_crop(im, args.patch, pad_if_needed=True)
        im = T.color_jitter(im, 0.3, 0.3, 0.3, 0.3, p=0.5)
        im = T.GaussianBlur(p=0.5, radius_min=1.0, radius_max=2.0)(im)
        return T.normalize_image(im)

    full_native = timed(lambda: full(True), args.iters)
    os.environ["VIT_ED_NATIVE_PIPELINE"] = "1"

    for name, ms in rows:
        print(f"  {name:38s} {ms:8.2f} ms", flush=True)
    print(f"  {'FULL train transform (native)':38s} {full_native:8.2f} ms "
          f"+ decode -> {full_native + rows[0][1]:.2f} ms/sample",
          flush=True)

    # threaded overlap: two threads running the native warp concurrently
    # (the C call releases the GIL; on a multi-core host this halves the
    # wall time — here it documents the 1-core ceiling)
    import threading

    def pair_run():
        ts = [threading.Thread(
            target=lambda: npipe.warp_affine(arr, m1, (0, 0, 0)))
            for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()

    two = timed(pair_run, max(args.iters // 2, 5))
    one = rows[1][1]
    print(f"  2 concurrent native warps: {two:.2f} ms for 2 "
          f"(scaling x{2 * one / two:.2f} on {os.cpu_count()} core(s))",
          flush=True)


if __name__ == "__main__":
    main()
