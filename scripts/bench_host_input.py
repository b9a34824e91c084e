"""Profile the host-side input pipeline of the flagship hisfrag train path.

Breaks one training sample's host time into: JPEG decode, random_affine
(cv2 warp), shift_scale_rotate (cv2 warp), random_crop, color_jitter,
GaussianBlur, normalize. Guides which stages the native C++ pipeline must
absorb (ROADMAP item: decode + warps were the measured dominators).
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from vit_ed_tpu.data import transforms as T


def timeit(fn, n=40):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    # flagship-scale fragment: ~1000 px jpeg
    arr = rng.integers(0, 255, size=(1000, 800, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    raw = buf.getvalue()
    print(f"jpeg size: {len(raw) / 1024:.0f} KB")

    def decode():
        with Image.open(io.BytesIO(raw)) as f:
            return f.convert("RGB")

    img = decode()
    print(f"decode:            {timeit(decode):7.2f} ms")

    import random
    random.seed(0)
    print(f"random_affine:     {timeit(lambda: T.random_affine(img, degrees=5, translate=(0.1, 0.1), fill=0)):7.2f} ms")
    print(f"shift_scale_rot:   {timeit(lambda: T.shift_scale_rotate(img, shift_limit=0.05, scale_limit=0.1, rotate_limit=10, p=1.0, border_value=(0, 0, 0))):7.2f} ms")
    print(f"random_crop 512:   {timeit(lambda: T.random_crop(img, 512, pad_if_needed=True)):7.2f} ms")
    crop = T.random_crop(img, 512, pad_if_needed=True)
    print(f"color_jitter:      {timeit(lambda: T.color_jitter(crop, 0.3, 0.3, 0.3, 0.3, p=1.0)):7.2f} ms")
    blur = T.GaussianBlur(p=1.0, radius_min=1.0, radius_max=2.0)
    print(f"gaussian_blur:     {timeit(lambda: blur(crop)):7.2f} ms")
    print(f"normalize:         {timeit(lambda: T.normalize_image(crop)):7.2f} ms")

    # full train transform chain (as hisfrag.py builds it)
    def full():
        x = T.random_affine(img, degrees=5, translate=(0.1, 0.1), fill=0)
        x = T.shift_scale_rotate(x, shift_limit=0.05, scale_limit=0.1,
                                 rotate_limit=10, p=0.5, border_value=(0, 0, 0))
        x = T.random_crop(x, 512, pad_if_needed=True)
        x = T.color_jitter(x, 0.3, 0.3, 0.3, 0.3, p=0.5)
        x = blur(x) if random.random() < 0.5 else x
        return T.normalize_image(x)

    print(f"full chain:        {timeit(full):7.2f} ms")
    print(f"decode+full:       {timeit(lambda: (decode(), full())):7.2f} ms")


if __name__ == "__main__":
    main()
