"""Lightweight prefetching data loader.

Replaces torch DataLoader for this framework: a thread pool maps dataset
``__getitem__`` over sampler indices with a bounded prefetch window, and
batches are collated into stacked numpy arrays ready for ``device_put``
onto the mesh. Threads suit this workload — PIL/cv2/numpy release the GIL
for the heavy ops — and sidestep torch's worker-process machinery
(the reference's worker processes, misc/engine.py:109-128).

Native whole-batch preparation: when the dataset opts in (it exposes
``raw_image(i)`` -> decoded u8 HWC array and ``item_meta(i)`` -> tuple of
the item's non-image fields, and its ``transform`` exposes ``pool_crop``
— the deterministic crop/resize/normalize tail), batches are prepared by
the persistent C++ worker pool (native/pipeline.cc): decode runs in
GIL-free loader threads, then one ``prep_batch`` call fuses
crop -> resample -> normalize for the whole batch off the Python thread.
Bit-exact vs the per-sample path (the same kernels back both); any batch
the pool cannot express (padding case / ragged output sizes) falls back
to per-sample ``__getitem__`` transparently.
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
                 prefetch_batches: int = 2, native_batch: Optional[bool] = None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(int(num_workers), 0)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch_batches = prefetch_batches
        self.native_batch = native_batch  # None = auto-detect
        self._pool_cache = None  # persistent across epochs once created
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

    def _native_pool(self):
        """A PipelinePool when this loader can prepare whole batches
        natively (see module docstring), else None."""
        if self.native_batch is False or self.num_workers == 0:
            return None
        if self.collate_fn is not default_collate:
            return None  # custom collation: item structure is unknown
        ds = self.dataset
        transform = getattr(ds, "transform", None)
        supported = ((hasattr(ds, "raw_image") or hasattr(ds, "raw_images"))
                     and hasattr(ds, "item_meta")
                     and hasattr(transform, "pool_crop"))
        if not supported:
            if self.native_batch:
                raise ValueError(
                    "native_batch=True needs dataset.raw_image (or "
                    "raw_images) + item_meta and transform.pool_crop")
            return None
        from vit_ed_tpu.native import pipeline as npipe

        if not npipe.is_available():
            return None
        if self._pool_cache is None:
            self._pool_cache = npipe.PipelinePool(self.num_workers)
        return self._pool_cache

    def __iter__(self):
        if self.num_workers == 0:
            for batch_idx in self._batched_indices():
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        native_pool = self._native_pool()
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            yield from self._iter_threaded(pool, native_pool)

    def _iter_threaded(self, pool, native_pool):
        ds = self.dataset
        batches = self._batched_indices()
        window = []
        max_window = max(self.prefetch_batches, 1)

        if native_pool is None:
            def submit(batch_idx):
                return [pool.submit(ds.__getitem__, i) for i in batch_idx]

            def finish(batch_idx, futures):
                return self.collate_fn([f.result() for f in futures])
        else:
            transform = ds.transform
            post_crop = getattr(transform, "pool_post_crop", None)
            # multi-image items (e.g. stacked eval pairs): raw_images(i)
            # returns k decoded images per item, pooled flat and re-stacked
            multi = hasattr(ds, "raw_images")
            fetch = ds.raw_images if multi else ds.raw_image

            def submit(batch_idx):
                # the prefetch window decodes (GIL-free threads) ...
                return [pool.submit(fetch, i) for i in batch_idx]

            def finish(batch_idx, futures):
                # ... and the consumer turn runs ONE pool call over the
                # whole batch, fusing crop -> resample -> normalize in C++
                if multi:
                    groups = [f.result() for f in futures]
                    k = len(groups[0])
                    if any(len(g) != k for g in groups):
                        return self.collate_fn(
                            list(pool.map(ds.__getitem__, batch_idx)))
                    raws = [a for g in groups for a in g]
                else:
                    raws = [f.result() for f in futures]
                crops, size = [], None
                for a in raws:
                    pc = transform.pool_crop(a.shape[:2])
                    if pc is None or (size is not None and pc[1] != size):
                        # padding case / ragged sizes: per-sample fallback
                        return self.collate_fn(
                            list(pool.map(ds.__getitem__, batch_idx)))
                    crops.append(pc[0])
                    size = pc[1]
                images = native_pool.prep_batch(raws, size, crops)
                if post_crop is not None:
                    # trailing center-crop commutes with the pointwise
                    # normalize: a plain slice of the pooled batch
                    y0, x0, hh, ww = post_crop(size)
                    images = np.ascontiguousarray(
                        images[:, y0:y0 + hh, x0:x0 + ww])
                if multi:
                    images = images.reshape((len(batch_idx), k)
                                            + images.shape[1:])
                metas = [ds.item_meta(i) for i in batch_idx]
                return (images,) + tuple(default_collate(metas))

        for batch_idx in itertools.islice(batches, max_window):
            window.append((batch_idx, submit(batch_idx)))
        while window:
            batch_idx, payload = window.pop(0)
            nxt = next(batches, None)
            if nxt is not None:
                window.append((nxt, submit(nxt)))
            yield finish(batch_idx, payload)
