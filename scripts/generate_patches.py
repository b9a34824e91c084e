"""Patch generation for the Pajigsaw-style datasets
(re-creates /root/reference/scripts/generate_patches.py): tile each source
image into overlapping (2x3-piece + erosion gap) group patches."""

import argparse
import math
import os

from PIL import Image

parser = argparse.ArgumentParser("Pajigsaw patch generating script", add_help=False)
parser.add_argument("--data-path", required=True, type=str)
parser.add_argument("--output-path", required=True, type=str)
parser.add_argument("--patch-size", type=int, default=128)
parser.add_argument("--erosion", type=float, default=0.07)


def main(args):
    patch_size = args.patch_size
    gap = patch_size * args.erosion
    images = []
    for root, _dirs, files in os.walk(args.data_path):
        for file in files:
            if file.lower().endswith((".jpg", ".png")):
                images.append(os.path.join(root, file))

    for image_path in images:
        with Image.open(image_path) as f:
            image = f.convert("RGB")

        # Upscale when the image cannot fit the target patch grid.
        ratio = (patch_size * 4 + gap * 3) / min(image.width, image.height)
        if ratio > 1:
            image = image.resize((math.ceil(ratio * image.width),
                                  math.ceil(ratio * image.height)), Image.LANCZOS)

        group_patch_size = int(patch_size * 2 + gap), int(patch_size * 3 + gap * 2)
        image_name = os.path.splitext(os.path.basename(image_path))[0]
        patch_dir = os.path.join(args.output_path, image_name)
        os.makedirs(patch_dir, exist_ok=True)
        i = 0.0
        while (i + 1) * group_patch_size[0] <= image.height:
            j = 0.0
            while (j + 1) * group_patch_size[1] <= image.width:
                box = (int(j * group_patch_size[1]), int(i * group_patch_size[0]),
                       int((j + 1) * group_patch_size[1]), int((i + 1) * group_patch_size[0]))
                image.crop(box).save(os.path.join(patch_dir, f"{i}_{j}.jpg"))
                j += 0.5
            i += 0.5


if __name__ == "__main__":
    main(parser.parse_args())
