"""Small host-side helpers (reference misc/utils.py:235-410 equivalents)."""

from __future__ import annotations

import random
import time
from typing import Callable, Dict, List, Sequence

import numpy as np


class AverageMeter:
    """Running average meter (reference misc/utils.py:276-303).

    ``all_reduce`` sums (sum, count) across JAX processes when running
    multi-host; single-process it is a no-op.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def all_reduce(self):
        import jax

        if jax.process_count() == 1:
            return
        # Cross-host sum via a tiny psum on one device per host.
        from jax.experimental.multihost_utils import process_allgather

        totals = process_allgather(np.asarray([self.sum, self.count], np.float64))
        totals = np.sum(np.asarray(totals), axis=0)
        self.sum, self.count = float(totals[0]), float(totals[1])
        self.avg = self.sum / max(self.count, 1)


class CalTimer:
    """Named-section wall-clock timer (reference misc/utils.py:252-273)."""

    def __init__(self):
        self.functions: Dict[str, AverageMeter] = {}
        self.ordered: List[str] = []
        self.current_time = None

    def set_timer(self):
        self.current_time = time.time()

    def time_me(self, func_name, current_time):
        diff = current_time - self.current_time
        self.current_time = current_time
        if func_name not in self.functions:
            self.functions[func_name] = AverageMeter()
            self.ordered.append(func_name)
        self.functions[func_name].update(diff)

    def get_results(self):
        return "\t".join(f"{k}: {self.functions[k].avg:.4f}" for k in self.ordered)


class UnableToCrop(Exception):
    def __init__(self, message, im_path=""):
        super().__init__(message + " " + im_path)
        self.im_path = im_path


def set_seed(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def list_to_idx(items: Sequence, name_converting_fn: Callable) -> List[int]:
    """Factorize item names into integer labels (misc/utils.py:347-352)."""
    labels = [name_converting_fn(x) for x in items]
    authors = list(set(labels))
    author_map = {x: i for i, x in enumerate(authors)}
    return [author_map[x] for x in labels]


def chunks(l: Sequence, n: int) -> List[Sequence]:
    """Yield n striped chunks from l (misc/utils.py:355-362)."""
    results = []
    for i in range(n):
        chunk = l[i::n]
        if len(chunk) > 0:
            results.append(chunk)
    return results


def split_list_by_ratios(lst, ratios):
    total_len = len(lst)
    split_points = [int(r * total_len) for r in ratios]
    sublists, start = [], 0
    for sp in split_points:
        sublists.append(lst[start : start + sp])
        start += sp
    sublists[-1].extend(lst[start:])
    return sublists


def get_repeated_indexes(input_size: int, output_size: int) -> np.ndarray:
    """Shuffled index vector covering input_size repeated to output_size
    (misc/utils.py:365-369)."""
    n_times = -(-output_size // input_size)
    res = np.concatenate([np.arange(input_size) for _ in range(n_times)])
    return np.random.permutation(res)[:output_size]


def n_batches(size: int, current_batch: int = -1) -> int:
    """Count of upper-triangle batch pairs before current_batch
    (misc/utils.py:158-167)."""
    total = 0
    for i in range(size):
        if i == current_batch:
            return total
        total += size - i
    return total


def get_combinations(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cartesian product of two index vectors -> [len(a)*len(b), 2]
    (misc/utils.py:372-377)."""
    ga, gb = np.meshgrid(a, b, indexing="ij")
    return np.stack([ga, gb], axis=-1).reshape(-1, 2)


def cosine_distance_np(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """1 - cosine similarity row-wise (misc/utils.py:380-383)."""
    sn = source / np.maximum(np.linalg.norm(source, axis=1, keepdims=True), 1e-12)
    tn = target / np.maximum(np.linalg.norm(target, axis=1, keepdims=True), 1e-12)
    return 1.0 - np.sum(sn * tn, axis=1)


def compute_distance_matrix(data: Dict[str, np.ndarray], reduction="mean",
                            distance_fn: Callable = cosine_distance_np):
    """Fragment-to-fragment distance matrix from per-fragment embedding sets
    (misc/utils.py:386-410). Returns (matrix [F, F], sorted fragment names)."""
    fragments = sorted(data.keys())
    n = len(fragments)
    matrix = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(i, n):
            a, b = data[fragments[i]], data[fragments[j]]
            combos = get_combinations(np.arange(len(a)), np.arange(len(b)))
            d = distance_fn(a[combos[:, 0]], b[combos[:, 1]])
            if reduction == "mean":
                v = d.mean()
            elif reduction == "max":
                v = d.max()
            elif reduction == "min":
                v = d.min()
            else:
                raise NotImplementedError(f"Reduction {reduction} is not implemented!")
            matrix[i, j] = matrix[j, i] = v
    return matrix, fragments
