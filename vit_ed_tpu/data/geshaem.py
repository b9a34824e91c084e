"""Geshaem papyrus fragment dataset
(re-creates /root/reference/data/datasets/geshaem_dataset.py; ml_engine
grouping and the imagesize dependency are replaced natively)."""

from __future__ import annotations

import glob
import os
import re
from enum import Enum
from typing import Callable, List, Optional

import numpy as np
from PIL import Image

from vit_ed_tpu.data.grouping import add_items_to_group


class Split(Enum):
    TRAIN = "train"
    VAL = "validation"
    TEST = "test"

    def is_train(self):
        return self.value == "train"

    def is_val(self):
        return self.value == "validation"

    def is_test(self):
        return self.value == "test"

    @staticmethod
    def from_string(name):
        for key in Split:
            if key.value == name:
                return key
        return None


def parse_name(name: str):
    """geshaem_dataset.py:39-44: ^(fragment)_(r|v)_(col)."""
    groups = re.search(r"^([\w']+)_([rv])_(\w+)(\s.+)?$", name)
    if groups:
        return groups.group(1), groups.group(2), groups.group(3)
    raise ValueError(f"Fragment name {name} not recognized")


def _image_size(path):
    with Image.open(path) as im:
        return im.size


def extract_relations(dataset_path):
    """Hand-assembled multi-fragment names define positive groups
    (geshaem_dataset.py:47-63)."""
    groups = []
    for img_path in glob.glob(os.path.join(dataset_path, "**", "*.jpg"), recursive=True):
        image_name = os.path.basename(os.path.dirname(os.path.dirname(img_path)))
        fragment, _rv, _col = parse_name(image_name)
        add_items_to_group(fragment.split("_"), groups)
    return groups


class MergeDataset:
    """geshaem_dataset.py:66-87."""

    def __init__(self, datasets, transform):
        self.data = []
        self.data_labels = []
        for dataset in datasets:
            self.data.extend(dataset.data)
            self.data_labels.extend(dataset.data_labels)
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        fragment = self.data[idx]
        with Image.open(fragment) as img:
            image = self.transform(img.convert("RGB"))
        return np.asarray(image, np.float32), np.asarray(self.data_labels[idx], np.int32)


class GeshaemPatch:
    """geshaem_dataset.py:90-206: all-pairs stacked fragment images with
    per-fragment group ground truth."""

    Split = Split

    def __init__(self, root: str, split: Split, transform: Optional[Callable] = None,
                 include_verso=False, min_size_limit=112, base_idx=0):
        self._split = split
        self.root_dir = root
        self.transform = transform
        im_size = 512
        self.fragment_to_group = {}
        self.fragment_to_group_id = {}

        fragments, groups = self.load_dataset(include_verso, min_size_limit,
                                              split.is_train())

        for idx, group in enumerate(groups):
            if len(group) < 2 and split.is_val():
                # Singleton groups have unknown membership; skip in eval.
                continue
            for fragment in group:
                self.fragment_to_group_id[fragment] = idx
                for fragment2 in group:
                    self.fragment_to_group.setdefault(fragment, set()).add(fragment2)

        self.fragments = sorted(fragments.keys())
        self.fragment_idx = {x: i for i, x in enumerate(self.fragments)}

        self.data: List[str] = []
        self.data_labels: List[int] = []
        for idx, fragment_name in enumerate(self.fragments):
            data, labels = [], []
            for img_path in sorted(fragments[fragment_name]):
                image_name = os.path.basename(
                    os.path.dirname(os.path.dirname(os.path.dirname(img_path))))
                fragment, _rv, _col = parse_name(image_name)
                fragment_ids = fragment.split("_")
                if fragment_ids[0] not in self.fragment_to_group:
                    continue
                width, height = _image_size(img_path)
                ratio = (max(round((width * height) / (im_size * im_size)), 1)
                         if split.is_train() else 1)
                for _ in range(int(ratio)):
                    labels.append(idx + base_idx)
                    data.append(img_path)
            self.data.extend(data)
            self.data_labels.extend(labels)

        n = len(self.data)
        iu = np.triu_indices(n)
        self.pairs = np.stack([iu[0], iu[1]], axis=1).astype(np.int64)

    def get_group_id(self, fragment_id: int) -> int:
        return self.fragment_to_group_id[self.fragments[fragment_id]]

    def load_dataset(self, include_verso, min_size_limit, is_train):
        fragments = {}
        groups = []
        for img_path in sorted(glob.glob(os.path.join(self.root_dir, "**", "*.jpg"),
                                         recursive=True)):
            if img_path.split(os.sep)[-3] != "papyrus":
                continue
            image_name = os.path.basename(
                os.path.dirname(os.path.dirname(os.path.dirname(img_path))))
            fragment, rv, _col = parse_name(image_name)
            if rv.upper() == "V" and not include_verso:
                continue

            fragment_ids = fragment.split("_")
            add_items_to_group(fragment_ids + [fragment], groups)
            if is_train and len(fragment_ids) > 1:
                # Exclude hand-assembled fragments from training (leakage).
                continue
            width, height = _image_size(img_path)
            if width * height < min_size_limit * min_size_limit:
                continue
            fragments.setdefault(fragment, []).append(img_path)
        return fragments, groups

    @property
    def split(self):
        return self._split

    def __getitem__(self, index: int):
        x1_id, x2_id = self.pairs[index]
        img_path = self.data[int(x1_id)]
        img_label = self.data_labels[int(x1_id)]
        with Image.open(img_path) as f:
            image = f.convert("RGB")
        img2_path = self.data[int(x2_id)]
        img2_label = self.data_labels[int(x2_id)]
        with Image.open(img2_path) as f:
            image2 = f.convert("RGB")
        if self.transform:
            image = self.transform(image)
            image2 = self.transform(image2)
        stacked = np.stack([np.asarray(image), np.asarray(image2)], axis=0)
        return stacked.astype(np.float32), np.asarray([img_label, img2_label], np.int64)

    def __len__(self):
        return len(self.pairs)
