"""HisFrag20 historical-fragment datasets
(re-creates /root/reference/data/datasets/hisfrag_dataset.py).

Filename scheme ``writer_page_fragment.jpg``; train/val split carves writers
93%/7% by sorted order (hisfrag_dataset.py:28-34, 99-101).
"""

from __future__ import annotations

import glob
import math
import os
from enum import Enum
from typing import Callable, List, Optional

import numpy as np
from PIL import Image

from vit_ed_tpu.utils.misc import chunks


class Split(Enum):
    TRAIN = "train"
    VAL = "val"
    TEST = "test"

    @property
    def length(self) -> float:
        return {Split.TRAIN: 0.93, Split.VAL: 0.07, Split.TEST: 1.0}[self]

    @property
    def sub_dir(self):
        return {Split.TRAIN: "train", Split.VAL: "train", Split.TEST: "test"}[self]

    def is_train(self):
        return self.value == "train"

    def is_val(self):
        return self.value == "val"

    def is_test(self):
        return self.value == "test"

    @staticmethod
    def from_string(name):
        for key in Split:
            if key.value == name:
                return key
        return None


def get_writers(root_dir, proportion=(0.0, 1.0)):
    """hisfrag_dataset.py:61-80."""
    writer_map = {}
    for img in sorted(glob.glob(os.path.join(root_dir, "**", "*.jpg"), recursive=True)):
        file_name = os.path.splitext(os.path.basename(img))[0]
        writer_id, page_id, _fragment_id = tuple(file_name.split("_"))
        writer_map.setdefault(writer_id, {}).setdefault(page_id, []).append(img)

    writers = sorted(writer_map.keys())
    n_writers = len(writers)
    from_idx, to_idx = int(proportion[0] * n_writers), int(proportion[1] * n_writers)
    writers = writers[from_idx:to_idx]
    writer_set = set(writers)
    for writer in list(writer_map.keys()):
        if writer not in writer_set:
            del writer_map[writer]
    return writers, writer_map


class HisFrag20:
    """Train-time dataset: (augmented image, writer idx)."""

    Split = Split

    def __init__(self, root: str, split: Split, transform: Optional[Callable] = None):
        self._split = split
        self.transform = transform
        self.root_dir = os.path.join(root, split.sub_dir)
        proportion = (0.0, split.length)
        if split.is_val():
            proportion = (1.0 - split.length, 1.0)
        writers, writer_map = get_writers(self.root_dir, proportion)

        self.writer_to_idx = {x: i for i, x in enumerate(writers)}
        samples, labels = [], []
        for writer in sorted(writer_map.keys()):
            for page in sorted(writer_map[writer].keys()):
                samples += writer_map[writer][page]
                labels += [self.writer_to_idx[writer]] * len(writer_map[writer][page])
        self.writer_map = writer_map
        self.data_labels = labels
        self.samples = samples
        self.writers = writers

    @property
    def split(self):
        return self._split

    def __getitem__(self, index: int):
        img_path = self.samples[index]
        file_name = os.path.splitext(os.path.basename(img_path))[0]
        writer_id = file_name.split("_")[0]
        with Image.open(img_path) as f:
            image = f.convert("RGB")
        label = self.writer_to_idx[writer_id]
        if self.transform is not None:
            image = self.transform(image)
        return np.asarray(image, np.float32), np.asarray(label, np.int32)

    def __len__(self):
        return len(self.samples)


class HisFrag20Test:
    """Eval sample list with the ``lower_bound`` offset used by the
    upper-triangle x2 scan (hisfrag_dataset.py:139-194)."""

    Split = Split

    def __init__(self, root: str, split: Split, transform: Optional[Callable] = None,
                 samples: Optional[List[str]] = None, lower_bound: int = 0,
                 val_n_items_per_writer: int = 2):
        if split.is_train():
            raise Exception("This class can only be used in Validation or Testing mode!")
        self.transform = transform

        if samples is None:
            root_dir = os.path.join(root, split.sub_dir)
            proportion = (0.0, 1.0)
            if split.is_val():
                proportion = (1.0 - split.length, 1.0)
            writers, writer_map = get_writers(root_dir, proportion)

            samples = []
            for writer_id in writers:
                page_patches = []
                for page_id in sorted(writer_map[writer_id].keys()):
                    page_patches += sorted(writer_map[writer_id][page_id])
                if split.is_val():
                    n_items_per_chunk = math.ceil(len(page_patches) / val_n_items_per_writer)
                    page_patches = chunks(page_patches, n_items_per_chunk)[0]
                samples += page_patches

        self.samples = samples
        self.lower_bound = lower_bound

    def __getitem__(self, index: int):
        index = index + self.lower_bound
        img_path = self.samples[index]
        with Image.open(img_path) as f:
            image = f.convert("RGB")
        if self.transform:
            image = self.transform(image)
        return np.asarray(image, np.float32), np.asarray(index, np.int64)

    def __len__(self):
        return len(self.samples) - self.lower_bound


class HisFrag20GT:
    """All-pairs ground-truth dataset for the replicated equivalence test
    (hisfrag_dataset.py:197-252)."""

    Split = Split

    def __init__(self, root: str, split: Split, transform: Optional[Callable] = None,
                 val_n_items_per_writer: int = 2):
        self.transform = transform
        root_dir = os.path.join(root, Split.TRAIN.sub_dir)
        proportion = (1.0 - split.length, 1.0)
        writers, writer_map = get_writers(root_dir, proportion)

        samples = []
        for writer_id in writers:
            page_patches = []
            for page_id in sorted(writer_map[writer_id].keys()):
                page_patches += sorted(writer_map[writer_id][page_id])
            if split.is_val():
                n_items_per_chunk = math.ceil(len(page_patches) / val_n_items_per_writer)
                page_patches = chunks(page_patches, n_items_per_chunk)[0]
            samples += page_patches

        self.samples = samples
        n = len(samples)
        iu = np.triu_indices(n)
        self.pairs = np.stack([iu[0], iu[1]], axis=1).astype(np.int64)

    def __getitem__(self, index: int):
        x1_id, x2_id = self.pairs[index]
        with Image.open(self.samples[int(x1_id)]) as f:
            image = f.convert("RGB")
        with Image.open(self.samples[int(x2_id)]) as f:
            image2 = f.convert("RGB")
        if self.transform:
            image = self.transform(image)
            image2 = self.transform(image2)
        stacked = np.stack([np.asarray(image), np.asarray(image2)], axis=0)
        return stacked.astype(np.float32), self.pairs[index]

    def __len__(self):
        return len(self.pairs)
