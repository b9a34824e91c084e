"""Patch generation for Pajigsaw-style datasets.

Tiles every source image into overlapping group patches sized for a
2x3-piece grid plus erosion gaps (the training-pair geometry of
data/div2k.py). Output layout: <output>/<image_name>/<row>_<col>.jpg with
half-patch stride in both axes.
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Iterator, Tuple

from PIL import Image


def iter_source_images(data_path: str) -> Iterator[str]:
    for root, _dirs, files in os.walk(data_path):
        for name in files:
            if name.lower().endswith((".jpg", ".png")):
                yield os.path.join(root, name)


def group_patch_shape(patch_size: int, erosion: float) -> Tuple[int, int]:
    """(height, width) of a 2x3-piece group patch including erosion gaps."""
    gap = patch_size * erosion
    return int(patch_size * 2 + gap), int(patch_size * 3 + gap * 2)


def ensure_min_size(image: Image.Image, patch_size: int, erosion: float) -> Image.Image:
    """Upscale images too small to contain a 4-piece span."""
    gap = patch_size * erosion
    needed = patch_size * 4 + gap * 3
    ratio = needed / min(image.width, image.height)
    if ratio <= 1:
        return image
    new_size = (math.ceil(ratio * image.width), math.ceil(ratio * image.height))
    return image.resize(new_size, Image.LANCZOS)


def tile_positions(image_h: int, image_w: int, gh: int, gw: int):
    """Half-stride (row_index, col_index, top, left) sweep over the image."""
    i = 0.0
    while (i + 1) * gh <= image_h:
        j = 0.0
        while (j + 1) * gw <= image_w:
            yield i, j, int(i * gh), int(j * gw)
            j += 0.5
        i += 0.5


def generate(data_path: str, output_path: str, patch_size: int, erosion: float):
    gh, gw = group_patch_shape(patch_size, erosion)
    for image_path in iter_source_images(data_path):
        with Image.open(image_path) as f:
            image = ensure_min_size(f.convert("RGB"), patch_size, erosion)

        stem = os.path.splitext(os.path.basename(image_path))[0]
        out_dir = os.path.join(output_path, stem)
        os.makedirs(out_dir, exist_ok=True)
        for i, j, top, left in tile_positions(image.height, image.width, gh, gw):
            patch = image.crop((left, top, left + gw, top + gh))
            patch.save(os.path.join(out_dir, f"{i}_{j}.jpg"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Pajigsaw patch generator")
    parser.add_argument("--data-path", required=True, type=str)
    parser.add_argument("--output-path", required=True, type=str)
    parser.add_argument("--patch-size", type=int, default=128)
    parser.add_argument("--erosion", type=float, default=0.07)
    a = parser.parse_args()
    generate(a.data_path, a.output_path, a.patch_size, a.erosion)
