"""Dataset augmentation preview
(re-creates /root/reference/scripts/visualise_dataset.py): iterate the
Michigan training augmentation pipeline and dump samples to disk (headless
environments have no imshow)."""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.data.michigan import MichiganDataset

parser = argparse.ArgumentParser("Dataset visualisation script")
parser.add_argument("--data-path", required=True, type=str)
parser.add_argument("--output-path", default="dataset_preview", type=str)
parser.add_argument("--n-samples", default=20, type=int)


def main(args):
    patch_size = 512

    def transform(img):
        img = T.RandomSizedCrop(224, 224, pad_if_needed=True, fill=255)(img)
        img = T.random_crop(img, 512, pad_if_needed=True, fill=255)
        import random

        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
        img = T.resize(img, patch_size)
        img = T.color_jitter(img, 0.2, 0.3, 0.3, 0.1, p=0.5)
        img = T.GaussianBlur(p=0.5, radius_max=2.0)(img)
        if random.random() < 0.2:
            img = img.convert("L").convert("RGB")
        return np.asarray(img)

    dataset = MichiganDataset(args.data_path, MichiganDataset.Split.TRAIN,
                              transforms=transform)
    os.makedirs(args.output_path, exist_ok=True)
    for i in range(min(args.n_samples, len(dataset))):
        img, label = dataset[i]
        Image.fromarray(np.asarray(img, np.uint8)).save(
            os.path.join(args.output_path, f"sample_{i}_label{int(label)}.png"))
    print(f"Saved {min(args.n_samples, len(dataset))} samples to {args.output_path}")


if __name__ == "__main__":
    main(parser.parse_args())
