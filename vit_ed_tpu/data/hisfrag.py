"""HisFrag20 historical-fragment datasets.

Same capabilities as the reference's ``data/datasets/hisfrag_dataset.py``
(filename scheme ``writer_page_fragment.jpg``; writer-level 93%/7%
train/val carve by sorted order, hisfrag_dataset.py:28-34, 99-101; val
subsampling by strided chunks; the ``lower_bound`` offset that lets the
O(N^2) scan's x2 stream enumerate only samples past a given index,
hisfrag_dataset.py:181-194) — rebuilt here around a flat fragment table
instead of the reference's nested writer->page dict loops. The split
semantics are locked by tests/test_hisfrag.py and tests/test_multiprocess.py.
"""

from __future__ import annotations

import glob
import math
import os
from dataclasses import dataclass
from enum import Enum
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from vit_ed_tpu.data.transforms import as_sample_array
from vit_ed_tpu.utils.misc import chunks


class Split(Enum):
    TRAIN = "train"
    VAL = "val"
    TEST = "test"

    @property
    def length(self) -> float:
        return {Split.TRAIN: 0.93, Split.VAL: 0.07, Split.TEST: 1.0}[self]

    @property
    def sub_dir(self) -> str:
        # val images live inside the train directory (held-out writers)
        return "test" if self is Split.TEST else "train"

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


@dataclass(frozen=True, order=True)
class Fragment:
    """One fragment image file, keyed ``writer_page_fragment.jpg``."""

    writer: str
    page: str
    path: str

    @staticmethod
    def parse(path: str) -> "Fragment":
        stem = os.path.splitext(os.path.basename(path))[0]
        writer, page, _frag = stem.split("_")
        return Fragment(writer=writer, page=page, path=path)


def _fragment_table(root_dir: str) -> List[Fragment]:
    """All fragments under ``root_dir``, ordered by (writer, page, path) —
    the same order the reference's sorted-glob + nested-dict walk yields."""
    paths = sorted(glob.glob(os.path.join(root_dir, "**", "*.jpg"),
                             recursive=True))
    return sorted(Fragment.parse(p) for p in paths)


def _writer_window(table: Sequence[Fragment],
                   proportion: Tuple[float, float]) -> List[str]:
    """The sorted-writer slice [lo*n : hi*n) the split owns."""
    writers = sorted({f.writer for f in table})
    lo, hi = (int(p * len(writers)) for p in proportion)
    return writers[lo:hi]


def _split_proportion(split: Split) -> Tuple[float, float]:
    if split.is_val():
        return (1.0 - split.length, 1.0)
    return (0.0, split.length)


def _load_rgb(path: str) -> Image.Image:
    from vit_ed_tpu.data.transforms import open_rgb

    return open_rgb(path)


class HisFrag20:
    """Train-time dataset: (augmented image, writer index)."""

    Split = Split

    def __init__(self, root: str, split: Split,
                 transform: Optional[Callable] = None):
        self._split = split
        self.transform = transform
        self.root_dir = os.path.join(root, split.sub_dir)

        table = _fragment_table(self.root_dir)
        self.writers = _writer_window(table, _split_proportion(split))
        rank = {w: i for i, w in enumerate(self.writers)}
        mine = [f for f in table if f.writer in rank]

        self.samples = [f.path for f in mine]
        self.data_labels = [rank[f.writer] for f in mine]
        self.writer_to_idx = rank

    @property
    def split(self) -> Split:
        return self._split

    def __getitem__(self, index: int):
        path = self.samples[index]
        image = _load_rgb(path)
        if self.transform is not None:
            image = self.transform(image)
        label = self.data_labels[index]
        # as_sample_array: uint8 transform outputs stay uint8 (the
        # TPU.DEVICE_NORMALIZE u8 wire — the model normalizes on device)
        return as_sample_array(image), np.asarray(label, np.int32)

    def __len__(self) -> int:
        return len(self.samples)

    # native whole-batch protocol (data/loader.py): activates for eval
    # loaders whose transform carries pool_crop (train-time random
    # augmentation chains keep the per-sample path)
    def raw_image(self, index: int) -> np.ndarray:
        return np.asarray(_load_rgb(self.samples[index]), np.uint8)

    def item_meta(self, index: int):
        return (np.asarray(self.data_labels[index], np.int32),)


def _eval_samples(root_dir: str, split: Split,
                  val_n_items_per_writer: int) -> List[str]:
    """Eval sample list: every fragment of the split's writers, with the
    val split strided down to ~``val_n_items_per_writer`` per writer
    (chunks(paths, ceil(len / n))[0] — hisfrag_dataset.py:171-173)."""
    table = _fragment_table(root_dir)
    keep = set(_writer_window(table, _split_proportion(split)))

    samples: List[str] = []
    for writer in sorted(keep):
        paths = [f.path for f in table if f.writer == writer]
        if split.is_val():
            stride = math.ceil(len(paths) / val_n_items_per_writer)
            paths = chunks(paths, stride)[0]
        samples.extend(paths)
    return samples


class HisFrag20Test:
    """Eval sample list with the ``lower_bound`` offset used by the
    upper-triangle x2 scan."""

    Split = Split

    def __init__(self, root: str, split: Split,
                 transform: Optional[Callable] = None,
                 samples: Optional[List[str]] = None, lower_bound: int = 0,
                 val_n_items_per_writer: int = 2):
        if split.is_train():
            raise Exception(
                "This class can only be used in Validation or Testing mode!")
        self.transform = transform
        if samples is None:
            samples = _eval_samples(os.path.join(root, split.sub_dir), split,
                                    val_n_items_per_writer)
        self.samples = samples
        self.lower_bound = lower_bound

    def raw_image(self, index: int) -> np.ndarray:
        """Decoded u8 HWC image WITHOUT the transform — the native
        batch-prep pool applies crop/resize/normalize in C++
        (parallel/pairs.py wires this into the O(N^2) scan). Indexing is
        identical to ``__getitem__`` (lower_bound applied) so the pooled
        and per-sample paths always load the same file."""
        return np.asarray(_load_rgb(self.samples[index + self.lower_bound]),
                          np.uint8)

    def item_meta(self, index: int):
        """Non-image fields of the ``__getitem__`` item, for the loader's
        native whole-batch path (data/loader.py)."""
        return (np.asarray(index + self.lower_bound, np.int64),)

    def __getitem__(self, index: int):
        index = index + self.lower_bound
        image = _load_rgb(self.samples[index])
        if self.transform:
            image = self.transform(image)
        return as_sample_array(image), np.asarray(index, np.int64)

    def __len__(self) -> int:
        return len(self.samples) - self.lower_bound


class HisFrag20GT:
    """All-pairs ground-truth dataset for the replicated equivalence test
    (reference hisfrag_dataset.py:197-252): the upper triangle, diagonal
    included, over the val/test writers' fragments."""

    Split = Split

    def __init__(self, root: str, split: Split,
                 transform: Optional[Callable] = None,
                 val_n_items_per_writer: int = 2):
        self.transform = transform
        # the GT variant always reads the train directory (held-out writers)
        self.samples = _eval_samples(os.path.join(root, Split.TRAIN.sub_dir),
                                     split, val_n_items_per_writer)
        hi, lo = np.triu_indices(len(self.samples))
        self.pairs = np.stack([hi, lo], axis=1).astype(np.int64)

    def __getitem__(self, index: int):
        i, j = (int(x) for x in self.pairs[index])
        first = _load_rgb(self.samples[i])
        second = _load_rgb(self.samples[j])
        if self.transform:
            first = self.transform(first)
            second = self.transform(second)
        stacked = np.stack([as_sample_array(first), as_sample_array(second)],
                           axis=0)
        return stacked, self.pairs[index]

    def __len__(self) -> int:
        return len(self.pairs)
