"""Index samplers (host-side), re-creating the reference's distributed
samplers (/root/reference/data/samplers.py) on top of numpy.

"Replicas" here are JAX processes (hosts); within a process the global batch
is additionally split across local devices by the mesh sharding, so these
samplers only need to carve the dataset across hosts.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np


class DistributedRepeatSampler:
    """Shuffled, padded, strided shard repeated ``repeat`` times per epoch
    (data/samplers.py:18-56)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 repeat: int = 1):
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.repeat = repeat
        self.epoch = 0
        if drop_last and dataset_len % num_replicas != 0:
            self.num_samples = math.ceil((dataset_len - num_replicas) / num_replicas)
        else:
            self.num_samples = math.ceil(dataset_len / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        all_indices: List[int] = []
        for _ in range(self.repeat):
            if self.shuffle:
                g = np.random.default_rng(self.seed + self.epoch)
                indices = g.permutation(self.dataset_len).tolist()
            else:
                indices = list(range(self.dataset_len))
            if not self.drop_last:
                padding = self.total_size - len(indices)
                if padding <= len(indices):
                    indices += indices[:padding]
                else:
                    indices += (indices * math.ceil(padding / len(indices)))[:padding]
            else:
                indices = indices[: self.total_size]
            all_indices += indices[self.rank : self.total_size : self.num_replicas]
        return iter(all_indices)

    def __len__(self):
        return self.num_samples * self.repeat


class DistributedEvalSampler:
    """Exact strided shard, NO padding (data/samplers.py:146-257)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = False, seed: int = 0, repeat: int = 1):
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.repeat = repeat
        self.epoch = 0
        self.num_samples = len(range(rank, dataset_len, num_replicas))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        all_indices: List[int] = []
        for _ in range(self.repeat):
            if self.shuffle:
                g = np.random.default_rng(self.seed + self.epoch)
                indices = g.permutation(self.dataset_len).tolist()
            else:
                indices = list(range(self.dataset_len))
            all_indices += indices[self.rank : self.dataset_len : self.num_replicas]
        return iter(all_indices)

    def __len__(self):
        return self.num_samples * self.repeat


def balanced_row_ranges(row_of_pair: np.ndarray, num_replicas: int
                        ) -> List[range]:
    """Split the x1-row axis of a triangular pair list into contiguous,
    load-balanced per-replica row ranges.

    Re-creates DistributedIndicatesSampler (data/samplers.py:80-143): the
    pair list is sorted by row; we cut it into ``num_replicas`` chunks of
    near-equal PAIR counts and snap cuts to row boundaries, so each replica
    owns whole rows of the upper-triangular pair matrix.
    """
    n_pairs = len(row_of_pair)
    per = math.ceil(n_pairs / num_replicas)
    cuts = [0]
    for r in range(1, num_replicas):
        idx = min(r * per, n_pairs - 1)
        row = int(row_of_pair[idx])
        # snap to the first pair of this row
        if idx > 0 and row_of_pair[idx - 1] == row:
            cuts.append(row + 1 if row + 1 > cuts[-1] else cuts[-1])
        else:
            cuts.append(max(row, cuts[-1]))
    cuts.append(int(row_of_pair[-1]) + 1)
    return [range(cuts[i], cuts[i + 1]) for i in range(num_replicas)]


class DistributedIndicatesSampler:
    """Per-rank contiguous x1-row range of the triangular pair space.

    Yields the row (sample) indices this rank owns — the sharded O(N^2)
    eval iterates x1 over exactly these rows (hisfrag.py:170-178).
    """

    def __init__(self, row_of_pair: np.ndarray, num_replicas: int, rank: int):
        ranges = balanced_row_ranges(np.asarray(row_of_pair), num_replicas)
        self.samples = list(ranges[rank])
        self.num_samples = len(self.samples)

    def __iter__(self):
        return iter(self.samples)

    def __len__(self):
        return self.num_samples


class MPerClassSampler:
    """m samples per class per pass (pytorch_metric_learning semantics,
    reference data/samplers.py:260-308 / hisfrag.py:109)."""

    def __init__(self, labels: Sequence[int], m: int, batch_size: Optional[int] = None,
                 length_before_new_iter: int = 100000, seed: int = 0):
        labels = np.asarray(labels)
        self.m_per_class = int(m)
        self.batch_size = int(batch_size) if batch_size is not None else None
        self.labels_to_indices: Dict[int, np.ndarray] = {
            int(l): np.flatnonzero(labels == l) for l in np.unique(labels)
        }
        self.labels = list(self.labels_to_indices.keys())
        self.length_of_single_pass = self.m_per_class * len(self.labels)
        self.list_size = length_before_new_iter
        self.rng = np.random.default_rng(seed)
        if self.batch_size is None:
            if self.length_of_single_pass < self.list_size:
                self.list_size -= self.list_size % self.length_of_single_pass
        else:
            assert self.list_size >= self.batch_size
            assert self.length_of_single_pass >= self.batch_size, \
                "m * (number of unique labels) must be >= batch_size"
            assert self.batch_size % self.m_per_class == 0, \
                "m_per_class must divide batch_size without any remainder"
            self.list_size -= self.list_size % self.batch_size

    def set_epoch(self, epoch: int):
        pass

    def __len__(self):
        return self.list_size

    def __iter__(self):
        idx_list = []
        total = 0
        while total < self.list_size:
            self.rng.shuffle(self.labels)
            if self.batch_size is None:
                curr = self.labels
            else:
                curr = self.labels[: self.batch_size // self.m_per_class]
            for label in curr:
                t = self.labels_to_indices[label]
                remaining = self.list_size - total
                if remaining == 0:
                    break
                size = min(self.m_per_class, len(t), remaining)
                items = self.rng.choice(t, size, replace=False)
                idx_list.append(items)
                total += size
        return iter(np.concatenate(idx_list).tolist())
