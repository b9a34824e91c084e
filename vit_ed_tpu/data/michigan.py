"""Michigan papyrus dataset
(re-creates /root/reference/data/datasets/michigan_dataset.py; the
``ml_engine`` grouping dependency is replaced by data/grouping.py)."""

from __future__ import annotations

import glob
import os
from enum import Enum
from typing import Callable, Optional

import numpy as np
from PIL import Image

from vit_ed_tpu.data.grouping import add_items_to_group


class Split(Enum):
    TRAIN = "train"
    VAL = "validation"
    ALL = "all"

    @property
    def length(self) -> float:
        return {Split.TRAIN: 0.85, Split.VAL: 0.15, Split.ALL: 1.0}[self]

    def is_train(self):
        return self.value == "train"

    def is_val(self):
        return self.value == "validation"

    @staticmethod
    def from_string(name):
        for key in Split:
            if key.value == name:
                return key
        return None


class MichiganDataset:
    """Papyrus-path parsing (7 trailing path components), recto/papyrus
    filtering, fragment grouping, 85/15 writer split, detail/summary image
    selection (michigan_dataset.py:41-122)."""

    Split = Split

    def __init__(self, dataset_path: str, split: Split, transforms: Callable,
                 samples=None, val_n_items_per_writer: Optional[int] = None):
        self.dataset_path = dataset_path
        self.samples = samples
        if samples is None:
            files = glob.glob(os.path.join(dataset_path, "**", "*.png"), recursive=True)
            files.extend(glob.glob(os.path.join(dataset_path, "**", "*.jpg"), recursive=True))
            files.sort()

            image_map = {}
            groups = []
            for file in files:
                parts = file.split(os.sep)
                im_name, rv, sum_det, sub_name, im_type, _, _ = parts[-7:]
                add_items_to_group([im_name, sub_name], groups)
                if rv != "front":
                    continue
                if im_type != "papyrus":
                    continue
                image_map.setdefault(im_name, {}).setdefault(sum_det, []).append(file)

            self.fragment_to_group = {}
            self.fragment_to_group_id = {}
            self.groups = groups
            for idx, group in enumerate(groups):
                for fragment in group:
                    self.fragment_to_group_id[fragment] = idx
                    for fragment2 in group:
                        self.fragment_to_group.setdefault(fragment, set()).add(fragment2)

            images = {}
            for img in image_map:
                key = "detail" if "detail" in image_map[img] else "summary"
                images[img] = image_map[img][key]
                if val_n_items_per_writer is not None and split.is_val():
                    images[img] = images[img][:val_n_items_per_writer]

            self.image_names = sorted(images.keys())
            if split == Split.TRAIN:
                self.image_names = self.image_names[: int(len(self.image_names) * split.length)]
            elif split == Split.VAL:
                self.image_names = self.image_names[-int(len(self.image_names) * split.length):]

            self.image_idxes = {k: i for i, k in enumerate(self.image_names)}
            self.data = []
            self.data_labels = []
            for img in self.image_names:
                data, labels = [], []
                for fragment in sorted(images[img]):
                    data.append(fragment)
                    labels.append(self.fragment_to_group_id[img])
                if split.is_val() and len(data) < 2:
                    continue
                self.data.extend(data)
                self.data_labels.extend(labels)
        else:
            self.data = samples

        self.transforms = transforms

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        fragment = self.data[idx]
        from vit_ed_tpu.data.transforms import open_rgb

        image = self.transforms(open_rgb(fragment))
        label = self.data_labels[idx]
        return np.asarray(image, np.float32), np.asarray(label, np.int32)


class MichiganTest(MichiganDataset):
    """lower_bound offset variant for the pair scan
    (michigan_dataset.py:125-145)."""

    Split = Split

    def __init__(self, dataset_path: str, split: Split, transforms,
                 lower_bound: int = 0, samples=None, val_n_items_per_writer: int = 2):
        super().__init__(dataset_path, split, transforms, samples=samples,
                         val_n_items_per_writer=val_n_items_per_writer)
        self.lower_bound = lower_bound
        if samples is not None:
            self.data = samples

    def __getitem__(self, index: int):
        index = index + self.lower_bound
        fragment = self.data[index]
        from vit_ed_tpu.data.transforms import open_rgb

        image = self.transforms(open_rgb(fragment))
        return np.asarray(image, np.float32), np.asarray(index, np.int64)

    def __len__(self):
        return len(self.data) - self.lower_bound

    # native whole-batch protocol (data/loader.py, parallel/pairs.py);
    # indexing identical to __getitem__ (lower_bound applied)
    @property
    def transform(self):
        return self.transforms

    def raw_image(self, index: int) -> np.ndarray:
        from vit_ed_tpu.data.transforms import open_rgb

        return np.asarray(open_rgb(self.data[index + self.lower_bound]),
                          np.uint8)

    def item_meta(self, index: int):
        return (np.asarray(index + self.lower_bound, np.int64),)
