"""Export a similarity-matrix CSV into the wi19 evaluator's input format.

Produces ``distance_matrix.csv`` (1 - similarity) and ``gt.csv`` mapping
each file to its writer group (the prefix before the first underscore).
"""

from __future__ import annotations

import argparse
import csv

import pandas as pd


def writer_group_of(name: str) -> str:
    return name.split("_")[0]


def export(similarity_file: str, distance_out: str = "distance_matrix.csv",
           gt_out: str = "gt.csv") -> None:
    similarity = pd.read_csv(similarity_file, index_col=0)

    with open(gt_out, "w", newline="") as f:
        writer = csv.writer(f)
        for key in similarity.index:
            writer.writerow([key, writer_group_of(key)])

    (1.0 - similarity).to_csv(distance_out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("wi19 export")
    parser.add_argument("--similarity_file", type=str, required=True)
    args = parser.parse_args()
    export(args.similarity_file)
