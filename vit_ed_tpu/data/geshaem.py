"""Geshaem papyrus fragment dataset.

Same capabilities as the reference's ``data/datasets/geshaem_dataset.py``
(name grammar ``^fragment_(r|v)_col``; hand-assembled multi-fragment
names define positive groups, geshaem_dataset.py:47-63; assembled
fragments excluded from train to prevent leakage; area-proportional
repetition at train; all-pairs upper-triangle enumeration) — rebuilt here
around a flat record scan instead of the reference's nested dict loops.
The ``ml_engine`` grouping and ``imagesize`` dependencies are replaced by
``vit_ed_tpu.data.grouping`` and PIL. Semantics are locked by
tests/test_datasets_misc.py.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Dict, List, Optional, Set, Tuple

import numpy as np
from PIL import Image

from vit_ed_tpu.data.grouping import add_items_to_group
from vit_ed_tpu.data.transforms import as_sample_array

_NAME_RE = re.compile(r"^([\w']+)_([rv])_(\w+)(\s.+)?$")
_REFERENCE_AREA = 512 * 512   # train repetition unit (im_size^2)


class Split(Enum):
    TRAIN = "train"
    VAL = "validation"
    TEST = "test"

    def is_train(self) -> bool:
        return self is Split.TRAIN

    def is_val(self) -> bool:
        return self is Split.VAL

    def is_test(self) -> bool:
        return self is Split.TEST

    @staticmethod
    def from_string(name: str) -> Optional["Split"]:
        try:
            return Split(name)
        except ValueError:
            return None


def parse_name(name: str) -> Tuple[str, str, str]:
    """Split a folder name into (fragment, recto/verso, column)
    (grammar at geshaem_dataset.py:39-44)."""
    m = _NAME_RE.match(name)
    if m is None:
        raise ValueError(f"Fragment name {name} not recognized")
    return m.group(1), m.group(2), m.group(3)


@dataclass(frozen=True)
class _Record:
    """One papyrus image: its path plus the parsed folder-name fields."""

    path: str
    fragment: str     # full (possibly multi-id) fragment name
    recto: bool
    area: int

    @property
    def piece_ids(self) -> List[str]:
        return self.fragment.split("_")

    @property
    def assembled(self) -> bool:
        return len(self.piece_ids) > 1


def _folder_name(path: str, levels: int) -> str:
    for _ in range(levels):
        path = os.path.dirname(path)
    return os.path.basename(path)


def _pixel_area(path: str) -> int:
    with Image.open(path) as im:
        w, h = im.size
    return w * h


def _scan_records(root: str) -> List[_Record]:
    """All ``**/papyrus/*/<file>.jpg`` images in sorted-path order."""
    records = []
    for path in sorted(glob.glob(os.path.join(root, "**", "*.jpg"),
                                 recursive=True)):
        if path.split(os.sep)[-3] != "papyrus":
            continue
        fragment, rv, _col = parse_name(_folder_name(path, 3))
        records.append(_Record(path=path, fragment=fragment,
                               recto=rv.upper() != "V",
                               area=_pixel_area(path)))
    return records


def extract_relations(dataset_path: str) -> List[Set[str]]:
    """Positive groups implied by hand-assembled multi-fragment names
    (geshaem_dataset.py:47-63). Note the reference variant here parses the
    2-levels-up folder and does not restrict to the papyrus subdir."""
    groups: List[Set[str]] = []
    for path in glob.glob(os.path.join(dataset_path, "**", "*.jpg"),
                          recursive=True):
        fragment, _rv, _col = parse_name(_folder_name(path, 2))
        add_items_to_group(fragment.split("_"), groups)
    return groups


class MergeDataset:
    """Concatenation of GeshaemPatch-style datasets (geshaem_dataset.py:66-87)."""

    def __init__(self, datasets, transform):
        self.data = [p for ds in datasets for p in ds.data]
        self.data_labels = [l for ds in datasets for l in ds.data_labels]
        self.transform = transform

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int):
        from vit_ed_tpu.data.transforms import open_rgb

        image = self.transform(open_rgb(self.data[idx]))
        # uint8 transform outputs stay uint8 (TPU.DEVICE_NORMALIZE u8 wire)
        return (as_sample_array(image),
                np.asarray(self.data_labels[idx], np.int32))


class GeshaemPatch:
    """All-pairs stacked fragment images with per-fragment group ground
    truth (geshaem_dataset.py:90-206)."""

    Split = Split

    def __init__(self, root: str, split: Split,
                 transform: Optional[Callable] = None,
                 include_verso: bool = False, min_size_limit: int = 112,
                 base_idx: int = 0):
        self._split = split
        self.root_dir = root
        self.transform = transform

        records = _scan_records(root)
        usable = [r for r in records if r.recto or include_verso]

        # group pass: every usable image's piece ids + full name merge into
        # one positive group, INCLUDING images later dropped from data
        groups: List[Set[str]] = []
        for r in usable:
            add_items_to_group(r.piece_ids + [r.fragment], groups)

        # membership maps; singleton groups are unknowable at eval time
        self.fragment_to_group: Dict[str, Set[str]] = {}
        self.fragment_to_group_id: Dict[str, int] = {}
        for idx, group in enumerate(groups):
            if len(group) < 2 and split.is_val():
                continue
            for member in group:
                self.fragment_to_group_id[member] = idx
                self.fragment_to_group.setdefault(member, set()).update(group)

        # data pass: at train, assembled fragments leak the answer — drop;
        # tiny images are noise — drop
        kept = [r for r in usable
                if not (split.is_train() and r.assembled)
                and r.area >= min_size_limit * min_size_limit]

        by_fragment: Dict[str, List[_Record]] = {}
        for r in kept:
            by_fragment.setdefault(r.fragment, []).append(r)
        self.fragments = sorted(by_fragment)
        self.fragment_idx = {name: i for i, name in enumerate(self.fragments)}

        self.data: List[str] = []
        self.data_labels: List[int] = []
        for idx, name in enumerate(self.fragments):
            for r in sorted(by_fragment[name], key=lambda rec: rec.path):
                if r.piece_ids[0] not in self.fragment_to_group:
                    continue
                repeats = 1
                if split.is_train():
                    repeats = max(round(r.area / _REFERENCE_AREA), 1)
                self.data.extend([r.path] * int(repeats))
                self.data_labels.extend([idx + base_idx] * int(repeats))

        hi, lo = np.triu_indices(len(self.data))
        self.pairs = np.stack([hi, lo], axis=1).astype(np.int64)

    def get_group_id(self, fragment_id: int) -> int:
        return self.fragment_to_group_id[self.fragments[fragment_id]]

    @property
    def split(self) -> Split:
        return self._split

    def __getitem__(self, index: int):
        i, j = (int(x) for x in self.pairs[index])
        from vit_ed_tpu.data.transforms import open_rgb

        first = open_rgb(self.data[i])
        second = open_rgb(self.data[j])
        if self.transform:
            first = self.transform(first)
            second = self.transform(second)
        stacked = np.stack([as_sample_array(first), as_sample_array(second)],
                           axis=0)
        labels = np.asarray([self.data_labels[i], self.data_labels[j]], np.int64)
        return stacked, labels

    def __len__(self) -> int:
        return len(self.pairs)

    # native whole-batch protocol (data/loader.py): each item is a
    # stacked pair, so raw_images (plural) hands the pool both decoded
    # fragments and the loader re-stacks [B, 2, H, W, C]
    def raw_images(self, index: int):
        from vit_ed_tpu.data.transforms import open_rgb

        i, j = (int(x) for x in self.pairs[index])
        return [np.asarray(open_rgb(self.data[i]), np.uint8),
                np.asarray(open_rgb(self.data[j]), np.uint8)]

    def item_meta(self, index: int):
        i, j = (int(x) for x in self.pairs[index])
        return (np.asarray([self.data_labels[i], self.data_labels[j]],
                           np.int64),)
