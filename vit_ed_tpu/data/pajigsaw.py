"""Pajigsaw fragment dataset: JSON-manifest fragments with grid row/col
(re-creates /root/reference/data/datasets/pajigsaw_dataset.py)."""

from __future__ import annotations

import json
import os
import random
from enum import Enum
from typing import Callable, Optional

import numpy as np
from PIL import Image

from vit_ed_tpu.solver.piece import PuzzlePiece


class Split(Enum):
    TRAIN = "train"
    VAL = "val"
    TEST = "test"

    def is_train(self):
        return self.value == "train"

    @staticmethod
    def from_string(name):
        for key in Split:
            if key.value == name:
                return key
        return None


class Pajigsaw:
    """Training pairs with 4-bin directional labels: positives (adjacent
    fragments) sampled 75%, otherwise in-image or cross-image negatives
    (pajigsaw_dataset.py:35-134)."""

    Split = Split

    def __init__(self, root: str, split: Split, transform: Optional[Callable] = None,
                 image_size: int = 512):
        self.root = root
        self.transform = transform
        with open(os.path.join(root, f"{split.value}.json")) as f:
            dataset = json.load(f)
        records = {}
        for img_name in dataset:
            records[img_name] = []
            for fragment in dataset[img_name]["Fragment1v1Rotate90"]:
                if fragment["degree"] == 0:
                    records[img_name].append({**fragment, "positive": [], "negative": []})
        self._split = split

        entries = {}
        samples = []
        for image_name, fragments in records.items():
            for first in fragments:
                for second in fragments:
                    if second["white_percentage"] > 0.85:
                        continue
                    if first["im_path"] == second["im_path"]:
                        continue
                    if first["col"] == second["col"] and abs(first["row"] - second["row"]) == 1:
                        first["positive"].append(second)
                    elif first["row"] == second["row"] and abs(first["col"] - second["col"]) == 1:
                        first["positive"].append(second)
                    else:
                        first["negative"].append(second)
                if len(first["positive"]) > 0:
                    first["im_name"] = image_name
                    entries.setdefault(image_name, []).append(first)
                    samples.append(first)
        self.im_names = sorted(entries.keys())
        self.samples = sorted(samples, key=lambda x: (x["col"], x["row"]))
        self.entries = entries

    @property
    def split(self):
        return self._split

    def __getitem__(self, index: int):
        first_entry = self.samples[index]
        im_name = first_entry["im_name"]
        if random.random() < 0.75:
            second_entry = random.choice(first_entry["positive"])
            if first_entry["col"] == second_entry["col"]:
                if first_entry["row"] < second_entry["row"]:
                    label = [0.0, 1.0, 0.0, 0.0]
                else:
                    label = [0.0, 0.0, 0.0, 1.0]
            elif first_entry["row"] == second_entry["row"]:
                if first_entry["col"] < second_entry["col"]:
                    label = [1.0, 0.0, 0.0, 0.0]
                else:
                    label = [0.0, 0.0, 1.0, 0.0]
            else:
                raise Exception(f"Incorrect entries {first_entry} and {second_entry}")
        else:
            cross_image_possible = len(self.im_names) > 1
            if (random.random() < 0.5 or not cross_image_possible) \
                    and len(first_entry["negative"]) > 0:
                second_entry = random.choice(first_entry["negative"])
            elif cross_image_possible:
                target_im_name = im_name
                while target_im_name == im_name:
                    target_im_name = random.choice(self.im_names)
                second_entry = random.choice(self.entries[target_im_name])
            else:
                # single-image manifest with no in-image negatives: fall back
                # to any other fragment (still non-adjacent -> negative)
                second_entry = random.choice(
                    [e for e in self.entries[im_name] if e is not first_entry])
            label = [0.0, 0.0, 0.0, 0.0]

        with Image.open(os.path.join(self.root, first_entry["im_path"])) as f:
            first_img = f.convert("RGB")
        with Image.open(os.path.join(self.root, second_entry["im_path"])) as f:
            second_img = f.convert("RGB")

        if self.transform is not None:
            first_img, second_img = self.transform(first_img, second_img)

        stacked = np.stack([np.asarray(first_img), np.asarray(second_img)], axis=0)
        return stacked.astype(np.float32), np.asarray(label, np.float32)

    def __len__(self):
        return len(self.samples)


class PajigsawPieces:
    """Per-image puzzle-piece lists for the solver
    (pajigsaw_dataset.py:137-174)."""

    def __init__(self, root: str, split: Split):
        with open(os.path.join(root, f"{split.value}.json")) as f:
            dataset = json.load(f)
        records = {}
        for img_name in dataset:
            records[img_name] = []
            for fragment in dataset[img_name]["Fragment1v1Rotate90"]:
                if fragment["degree"] == 0:
                    records[img_name].append(fragment)
        self._split = split
        self.root = root
        self.entries = sorted(records.keys())
        self.entry_map = records

    @property
    def split(self):
        return self._split

    def __getitem__(self, index: int):
        import cv2

        im_name = self.entries[index]
        entry = self.entry_map[im_name]
        puzzle_id = index
        numb_rows = max(x["row"] for x in entry) + 1
        numb_cols = max(x["col"] for x in entry) + 1
        grid_size = (numb_rows, numb_cols)
        pieces = []
        for idx, item in enumerate(entry):
            img_path = os.path.join(self.root, item["im_path"])
            img_lab = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2LAB)
            pieces.append(PuzzlePiece(puzzle_id, (item["row"], item["col"]), img_lab,
                                      piece_id=idx, puzzle_grid_size=grid_size))
        return pieces, im_name, grid_size

    def __len__(self):
        return len(self.entries)
