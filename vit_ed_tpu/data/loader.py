"""Lightweight prefetching data loader.

Replaces torch DataLoader for this framework: a thread pool maps dataset
``__getitem__`` over sampler indices with a bounded prefetch window, and
batches are collated into stacked numpy arrays ready for ``device_put``
onto the mesh. Threads suit this workload — PIL/cv2/numpy release the GIL
for the heavy ops — and sidestep torch's worker-process machinery.
"""

from __future__ import annotations

import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np


def default_collate(items):
    """Stack tuples of numpy-able leaves."""
    first = items[0]
    if isinstance(first, (tuple, list)):
        return tuple(default_collate([it[i] for it in items])
                     for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([it[k] for it in items]) for k in first}
    return np.stack([np.asarray(it) for it in items])


class DataLoader:
    def __init__(self, dataset, sampler: Optional[Iterable[int]] = None,
                 batch_size: int = 1, num_workers: int = 0,
                 drop_last: bool = False, collate_fn: Callable = default_collate,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(int(num_workers), 0)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch_batches = prefetch_batches
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _indices(self) -> Iterator[int]:
        if self.sampler is not None:
            return iter(self.sampler)
        return iter(range(len(self.dataset)))

    def _num_indices(self) -> int:
        if self.sampler is not None:
            return len(self.sampler)
        return len(self.dataset)

    def __len__(self) -> int:
        n = self._num_indices()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batched_indices(self):
        it = self._indices()
        while True:
            batch = list(itertools.islice(it, self.batch_size))
            if not batch:
                return
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def __iter__(self):
        if self.num_workers == 0:
            for batch_idx in self._batched_indices():
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            batches = self._batched_indices()
            window = []
            max_window = max(self.prefetch_batches, 1)

            def submit(batch_idx):
                return [pool.submit(self.dataset.__getitem__, i) for i in batch_idx]

            for batch_idx in itertools.islice(batches, max_window):
                window.append(submit(batch_idx))
            while window:
                futures = window.pop(0)
                nxt = next(batches, None)
                if nxt is not None:
                    window.append(submit(nxt))
                yield self.collate_fn([f.result() for f in futures])
