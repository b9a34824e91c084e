"""Retrieval-result grid visualization
(re-creates /root/reference/scripts/hisfrag_visualize_results.py): for a
few random query columns of a distance matrix, show the top retrieved
fragments with green/red correctness borders."""

import argparse
import csv
import os
import random

import numpy as np
import pandas as pd
from PIL import Image, ImageOps

parser = argparse.ArgumentParser("Prediction visualization", add_help=True)
parser.add_argument("--dataset-dir", required=True, help="Path to the images dataset")
parser.add_argument("--distance_matrix", required=True, help="Path to distance matrix CSV")
parser.add_argument("--output", default="retrieval_grid.png")


def read_img(dataset_dir, img_name, is_correct, border_size=10, size=512):
    img_file = os.path.join(dataset_dir, img_name + ".jpg")
    with Image.open(img_file) as f:
        img = f.convert("RGB")
    crop = size - border_size * 2 - 4
    w, h = img.size
    left, top = max((w - crop) // 2, 0), max((h - crop) // 2, 0)
    img = img.crop((left, top, left + crop, top + crop))
    if border_size > 0:
        border_color = "green" if is_correct else "red"
        img = ImageOps.expand(img, border=border_size, fill=border_color)
    return ImageOps.expand(img, border=2, fill="white")


def main(args):
    with open(args.distance_matrix) as csv_file:
        header = next(csv.reader(csv_file, delimiter=","))

    n_col, n_items = 7, 9
    column_idxs = random.sample(range(1, len(header)), k=n_col)
    distance_matrix = pd.read_csv(args.distance_matrix, index_col=0,
                                  usecols=[0] + column_idxs)
    similarity_matrix = 1 - distance_matrix

    columns = []
    for col in column_idxs:
        col_name = header[col]
        author = col_name.split("_")[0]
        records = similarity_matrix[col_name].nlargest(n_items)
        col_images = [read_img(args.dataset_dir, col_name, True, border_size=0)]
        for key, _value in records.items():
            col_images.append(read_img(args.dataset_dir, key,
                                       key.split("_")[0] == author))
        columns.append(col_images)

    # assemble grid: rows = retrieval rank (skipping the self column),
    # columns = queries
    tile = columns[0][0].size[0]
    rows = [i for i in range(len(columns[0])) if i != 1]
    grid = Image.new("RGB", (tile * n_col, tile * len(rows)), "black")
    for r, i in enumerate(rows):
        for c in range(n_col):
            grid.paste(columns[c][i].resize((tile, tile)), (c * tile, r * tile))
    grid.save(args.output)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main(parser.parse_args())
