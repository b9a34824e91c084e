"""Convert a similarity-matrix CSV into the wi19 evaluator's
distance-matrix + ground-truth CSV format
(re-creates /root/reference/scripts/convert_wi19.py)."""

import argparse
import csv

import pandas as pd

parser = argparse.ArgumentParser("wi19 conversion script", add_help=False)
parser.add_argument("--similarity_file", type=str, required=True,
                    help="path to similarity matrix")


def main(args):
    similarity_map = pd.read_csv(args.similarity_file, index_col=0)
    gt_data = []
    for key in similarity_map.index:
        group = key.split("_")[0]
        gt_data.append({"file": key, "group": group})

    with open("gt.csv", "w") as f:
        writer = csv.DictWriter(f, fieldnames=["file", "group"])
        writer.writerows(gt_data)

    distance_map = 1.0 - similarity_map
    distance_map.to_csv("distance_matrix.csv")


if __name__ == "__main__":
    main(parser.parse_args())
