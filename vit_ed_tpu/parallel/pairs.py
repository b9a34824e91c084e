"""Sharded O(N^2) pairwise similarity computation.

This is the TPU-native replacement for the reference's signature
distributed path (/root/reference/hisfrag.py:161-302): scoring all
N(N+1)/2 image pairs with the ViT-ED decoder, where N ~ 20k.

Reference design -> TPU re-design:

- per-rank contiguous x1-row ranges of the triangular pair space
  (DistributedIndicatesSampler, data/samplers.py:80-143)
  -> the same balanced row-range split across JAX processes
  (``balanced_row_ranges``), and across local devices the PAIR axis of
  each block is sharded over the mesh ``data`` axis
- encoder runs once per x1 block, decoder streams x2 batches
  (hisfrag.py:213-229) -> identical dataflow, but pair chunks are
  fixed-shape padded buffers so one compiled XLA program serves every
  chunk; stream-2 patch embedding is also hoisted out of the pair loop
  (``prepare_x2`` once per x2 batch — the reference re-embeds x2 for
  every pair)
- shared-filesystem gather with 120 s polling (hisfrag.py:251-276)
  -> per-process results live in device/host memory; cross-process merge
  is a single allgather; the on-disk .npz blocks exist only for
  RESUMABILITY (crash-restart skips finished row blocks, mirroring
  hisfrag.py:179-195)
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import balanced_row_ranges


def _round_up(a, b):
    return -(-a // b) * b


class PairwiseScorer:
    """Block-tiled pair scoring with encoder features computed once.

    Args:
        model: a ViTED flax module.
        params: model params (replicated).
        mesh: device mesh with a ``data`` axis.
        num_outputs: logits per pair (1 for writer-ID, 4 for puzzle bins).
    """

    def __init__(self, model, params, mesh: Mesh, num_outputs: int = 1,
                 pair_chunk: int = 512, dtype=np.float16,
                 use_kv_cache: bool = False, row_shared: bool = True,
                 int8: bool = False):
        from vit_ed_tpu.parallel.mesh import local_mesh

        if int8:
            # scoring-time int8 GEMMs (TPU.INT8_SCORE): same params, the
            # projection matmuls run int8 on the MXU (ops/quant.py); gated
            # by the mAP-parity test in tests/test_quant.py. Measured per
            # model size in docs/PERFORMANCE.md (wins are HBM-bound shapes).
            model = model.clone(int8_gemm=True)

        # Every process scores a DIFFERENT row range, so the jit programs
        # here are per-process computations over the LOCAL devices; the
        # cross-process merge is the process_allgather in score_dataset.
        lmesh = local_mesh(mesh)
        if lmesh is not mesh:
            # re-home replicated params from the global mesh onto the
            # local one (via host; every process holds full replicas)
            params = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), params)
        mesh = lmesh
        self.model = model
        self.params = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
        self.mesh = mesh
        self.num_outputs = num_outputs
        self.n_devices = mesh.devices.size
        self.pair_chunk = _round_up(pair_chunk, self.n_devices)
        self.dtype = dtype

        rep = NamedSharding(mesh, P())
        shard0 = NamedSharding(mesh, P("data"))

        self._encode = jax.jit(
            lambda p, x: model.apply({"params": p}, x, forward_first_part=True),
            in_shardings=(rep, shard0), out_shardings=rep)
        # per-cross-block K/V projections of the encoder features, computed
        # ONCE per x1 row block ([L, B, Sk, 2C]); every pair sharing a row
        # would reuse them, removing the per-pair kv GEMMs from the decode.
        # MEASURED SLOWER at both flagship scales and ships default-OFF:
        # the per-pair jnp.take on the [L, rows, Sk, 2C] cache materialises
        # a gathered copy whose HBM traffic exceeds the 7.25 GF/pair of
        # GEMMs it saves (patch16_512 decode 947 -> 720 pairs/s; patch8_64
        # 14.6k -> 12.9k). The exact-equivalence of the decomposition is
        # locked by tests/test_model.py for when a much larger model makes
        # the trade profitable.
        self.use_kv_cache = use_kv_cache
        self._context_kv = jax.jit(
            lambda p, f: model.apply({"params": p}, f,
                                     method=model.context_kv_cache),
            in_shardings=(rep, rep), out_shardings=rep)
        # stream-2 prep ADVANCED through decoder block 0's self-attention
        # (depends only on x2, so it amortises over the pair loop like the
        # patch embedding; prepare_x2_scan + score_tokens_scan compose to
        # exactly prepare_x2 + score_tokens)
        self._prepare = jax.jit(
            lambda p, x: model.apply({"params": p}, x,
                                     method=model.prepare_x2_scan),
            in_shardings=(rep, shard0), out_shardings=rep)

        def score_kv(p, kv_cache, tokens, pi, pj):
            kvs = jnp.take(kv_cache, pi, axis=1)
            t = jnp.take(tokens, pj, axis=0)
            return model.apply({"params": p}, kvs, t,
                               method=model.score_tokens_kv)

        def score_feats(p, feats, tokens, pi, pj):
            f = jnp.take(feats, pi, axis=0)
            t = jnp.take(tokens, pj, axis=0)
            return model.apply({"params": p}, f, t,
                               method=model.score_tokens_scan)

        self._score = jax.jit(score_kv if self.use_kv_cache else score_feats,
                              in_shardings=(rep, rep, rep, shard0, shard0),
                              out_shardings=rep)

        # Row-sharded schedule (default): every pair chunk shares ONE x1
        # row, so the whole context_kv block for the row range is computed
        # once ([L, R, Sk, 2C] — bounds device memory to ~19 MB x R at
        # patch16_512; choose batch_size accordingly) and each dispatch
        # slices its row and runs the shared-context attention kernel
        # (ViTED.score_tokens_row). Unlike the per-pair kv gather (the
        # use_kv_cache=True path, measured SLOWER), the slice is one row —
        # no per-pair HBM traffic — and the kernel keeps the row's K/V
        # tiles VMEM-resident across the chunk.
        self.row_shared = row_shared and not use_kv_cache

        def score_row(p, kv_block, tokens, ri, pj):
            kv_row = jax.lax.dynamic_slice_in_dim(kv_block, ri, 1, axis=1)
            t = jnp.take(tokens, pj, axis=0)
            return model.apply({"params": p}, kv_row, t,
                               method=model.score_tokens_row)

        self._score_row = jax.jit(
            score_row,
            in_shardings=(rep, rep, rep, rep, shard0), out_shardings=rep)

        # Multi-row dispatch: ONE jitted call scores R row-chunks by
        # scanning score_tokens_row over (row index, column chunk) pairs —
        # numerically identical to R separate _score_row dispatches (same
        # kernel, same chunking), but the per-dispatch host->device
        # round-trip amortizes over R. On the tunneled single chip that
        # overhead measured ~30 ms per dispatch against ~60 ms of compute
        # (the round-5 N=2k scan: 681 pairs/s sustained vs the 1,060
        # kernel bench); batching R=64 rows into one dispatch removes it.
        def score_rows(p, kv_block, tokens, ri, pj):
            def body(_, rp):
                r, pjr = rp
                return _, score_row(p, kv_block, tokens, r, pjr)

            _, out = jax.lax.scan(body, 0, (ri, pj))
            return out  # [R, chunk, num_outputs]

        self._score_rows = jax.jit(
            score_rows,
            in_shardings=(rep, rep, rep, rep,
                          NamedSharding(mesh, P(None, "data"))),
            out_shardings=rep)
        self.rows_per_dispatch = 64

    # ------------------------------------------------------------------
    def _kv_block_bytes(self, n_rows: int) -> int:
        """Device bytes of a ``context_kv_cache`` block for ``n_rows``
        encoder rows: [c_depth, n_rows, Sk, 2C] in the model's compute
        dtype (replicated per device)."""
        m = self.model
        itemsize = jnp.dtype(m.dtype).itemsize
        return (getattr(m, "c_depth", 12) * n_rows
                * getattr(m, "num_patches", 1024)
                * 2 * getattr(m, "embed_dim", 384) * itemsize)

    # ------------------------------------------------------------------
    def score_pairs_block(self, context, tokens, pair_i: np.ndarray,
                          pair_j: np.ndarray, max_in_flight: int = 4
                          ) -> np.ndarray:
        """Score an arbitrary list of (local-i, local-j) pairs in fixed-shape
        chunks. ``context`` is the x1 rows' ``context_kv_cache``
        ([L, rows, Sk, 2C]) when ``use_kv_cache``, else the raw encoder
        features [rows, Sk, C]. Returns [len(pairs), num_outputs] float32.

        Chunk dispatches are pipelined: up to ``max_in_flight`` compiled
        calls are queued on the device before the oldest result is fetched,
        hiding dispatch latency behind compute."""
        n_pairs = len(pair_i)
        out = np.empty((n_pairs, self.num_outputs), np.float32)
        chunk = self.pair_chunk
        in_flight = []  # (lo, hi, device_array)
        for lo in range(0, n_pairs, chunk):
            hi = min(lo + chunk, n_pairs)
            pi = np.zeros(chunk, np.int32)
            pj = np.zeros(chunk, np.int32)
            pi[: hi - lo] = pair_i[lo:hi]
            pj[: hi - lo] = pair_j[lo:hi]
            logits = self._score(self.params, context, tokens,
                                 jnp.asarray(pi), jnp.asarray(pj))
            in_flight.append((lo, hi, logits))
            if len(in_flight) >= max_in_flight:
                flo, fhi, fl = in_flight.pop(0)
                out[flo:fhi] = np.asarray(fl, np.float32)[: fhi - flo]
        for flo, fhi, fl in in_flight:
            out[flo:fhi] = np.asarray(fl, np.float32)[: fhi - flo]
        return out

    # ------------------------------------------------------------------
    def score_rows_block(self, kv_block, tokens, rows_cols,
                         max_in_flight: int = 4, defer: bool = False):
        """Row-sharded scoring: for each ``(row_idx, col_idx)`` in
        ``rows_cols`` score the pairs (row_idx, j), j in col_idx — every
        chunk shares the single x1 row sliced out of ``kv_block``
        ([L, R, Sk, 2C], the ``context_kv_cache`` of the current row
        range), so the shared-context kernel keeps the row's K/V tiles
        VMEM-resident across the chunk (ViTED.score_tokens_row).

        Dispatches are pipelined across rows AND chunks (up to
        ``max_in_flight`` queued before the oldest result is fetched).
        Returns a list of [len(col_idx), num_outputs] float32 arrays."""
        # full pair_chunk dispatches when the column batch allows it, but
        # never a chunk larger than the token batch (wasted padding)
        chunk = min(self.pair_chunk,
                    _round_up(int(tokens.shape[0]), self.n_devices))
        if getattr(self.model, "num_patches", 0) >= 1024:
            # measured sweet spot at flagship context sizes: 64 pairs per
            # device (docs/PERFORMANCE.md chunk sweep: 64 -> 1,054 pairs/s,
            # 128 -> 932, 256 -> 860 — the working set outgrows
            # VMEM-adjacent reuse)
            chunk = min(chunk, 64 * self.n_devices)
        chunk = max(chunk, self.n_devices)
        outs = [np.empty((len(cols), self.num_outputs), np.float32)
                for _, cols in rows_cols]

        # flatten every (row, column-chunk) into a segment, then pack
        # ``rows_per_dispatch`` segments into ONE multi-row jit dispatch
        # (short groups pad with repeats of segment 0, discarded on write)
        segments = []  # (out_idx, lo, hi, row_idx)
        for oi, (row_idx, cols) in enumerate(rows_cols):
            for lo in range(0, len(cols), chunk):
                segments.append((oi, lo, min(lo + chunk, len(cols)), row_idx))
        r_per = max(int(self.rows_per_dispatch), 1)

        in_flight = []

        def drain_one():
            grp, fl = in_flight.pop(0)
            scores = np.asarray(fl, np.float32)  # [r_per, chunk, C]
            for k, (oi, lo, hi, _row) in enumerate(grp):
                outs[oi][lo:hi] = scores[k, : hi - lo]

        for g in range(0, len(segments), r_per):
            grp = segments[g:g + r_per]
            ri = np.zeros(r_per, np.int32)
            pj = np.zeros((r_per, chunk), np.int32)
            for k, (oi, lo, hi, row_idx) in enumerate(grp):
                ri[k] = row_idx
                pj[k, : hi - lo] = rows_cols[oi][1][lo:hi]
            logits = self._score_rows(self.params, kv_block, tokens,
                                      jnp.asarray(ri), jnp.asarray(pj))
            in_flight.append((grp, logits))
            if len(in_flight) >= max_in_flight:
                drain_one()
        if defer:
            # the caller drains AFTER dispatching the next tile's prepare —
            # the host->device upload and prepare_x2 of tile k+1 enqueue
            # behind tile k's scoring instead of waiting for its fetch
            def drain_all():
                while in_flight:
                    drain_one()
                return outs

            return outs, drain_all
        while in_flight:
            drain_one()
        return outs

    # ------------------------------------------------------------------
    def _token_cache_bytes(self, n_imgs: int) -> int:
        """Device bytes of a full x2-token cache: [n, num_patches + 1, C]
        in the compute dtype (replicated per device)."""
        m = self.model
        return (n_imgs * (getattr(m, "num_patches", 1024) + 1)
                * getattr(m, "embed_dim", 384) * jnp.dtype(m.dtype).itemsize)

    def score_dataset(self, dataset, batch_size: int, logger=None,
                      out_dir: Optional[str] = None, tag: str = "test",
                      rank: int = 0, world_size: int = 1,
                      resume: bool = True, print_freq: int = 10,
                      num_workers: int = 8, assemble: bool = True,
                      slab_on_disk: bool = False,
                      token_cache: Optional[bool] = None):
        """Compute the full upper-triangular pair score matrix for a dataset
        of N images.

        Multi-process: each process computes its balanced contiguous row
        range; results merge via allgather at the end.

        Memory envelope: during the scan each process holds only its ROW
        SLAB (~N^2/world_size scores). With ``assemble=True`` (default)
        the full symmetric [N, N(, C)] matrix is allocated once at the end
        on every process (N=20k float16 -> ~800 MB; fine at HisFrag20
        scale, dominant past N~50k). For very large N pass
        ``assemble=False``: returns ``(rows_scores, row_range)`` where
        ``rows_scores`` are this process's COMPLETE rows (the transposed
        lower-triangle entries are exchanged slab-by-slab, never
        materialising N^2 anywhere) — feed them to
        metrics.wi19_sharded.row_partials / merge_partials.

        ``slab_on_disk=True`` (requires ``out_dir`` and ``assemble=False``)
        backs the row slab itself with an ``np.memmap`` under ``out_dir``,
        so host RAM stays O(batch) at ANY N — the memmap file doubles as
        the resume store (tiny ``.done`` markers replace the per-block
        ``.npz`` caches, no second copy of the scores on disk). The
        returned ``rows_scores`` is the memmap; consume it in row blocks
        (as hisfrag._test_sharded does) to keep the O(batch) envelope.

        ``token_cache`` (row-sharded schedule only): precompute the
        prepared x2 tokens for ALL N images ONCE, device-resident, and
        index them per pair chunk — instead of re-decoding, re-uploading
        and re-preparing each column image once per row block it appears
        in (~N/(2*batch) times; the round-5 N=2k scan measured the scan
        host-feed-bound at 84% of the kernel bench because of exactly
        this). ``None`` (default) auto-enables when the cache fits the
        ``VIT_ED_EVAL_TOKEN_CACHE_GB`` budget (default 4 GiB — N=2k at
        patch16_512 is 1.57 GiB; real HisFrag20 N~20k is 15.7 GiB and
        falls back to streaming); ``True`` forces it (caller owns HBM
        accounting), ``False`` disables.
        """
        n = len(dataset)
        # the row-sharded schedule keeps the row block's context_kv cache
        # resident per device ([c_depth, rows, Sk, 2C]); guard against
        # batch sizes where that replica would crowd out HBM and fall
        # back to the mixed-chunk schedule
        row_shared = self.row_shared
        if row_shared:
            rows_pad = _round_up(batch_size, self.n_devices)
            kv_bytes = self._kv_block_bytes(rows_pad)
            if kv_bytes > 4 << 30:
                row_shared = False
                if logger:
                    logger.warning(
                        f"row-sharded schedule disabled: context_kv block "
                        f"for {rows_pad} rows would take "
                        f"{kv_bytes / (1 << 30):.1f} GiB/device; using the "
                        f"mixed-chunk schedule (reduce batch_size to "
                        f"re-enable)")
        iu = np.triu_indices(n)
        row_of_pair = iu[0]
        ranges = balanced_row_ranges(row_of_pair, world_size)
        my_rows = ranges[rank]
        r0 = my_rows.start

        # row slab only: [my rows, N, C]; the full matrix (if requested)
        # is assembled once after the scan
        slab_shape = (my_rows.stop - my_rows.start, n, self.num_outputs)
        if slab_on_disk:
            if assemble:
                raise ValueError("slab_on_disk requires assemble=False "
                                 "(assembling N x N defeats the point)")
            if not out_dir:
                raise ValueError("slab_on_disk requires out_dir")
            slab = self._open_slab(out_dir, tag, rank, slab_shape,
                                   fresh=not resume, logger=logger)
        else:
            slab = np.zeros(slab_shape, self.dtype)

        row_blocks = [
            range(r, min(r + batch_size, my_rows.stop))
            for r in range(my_rows.start, my_rows.stop, batch_size)
        ]

        def load_images(indices):
            items = [dataset[i] for i in indices]
            return np.stack([it[0] for it in items])

        loader_pool = None
        native_pool = None
        if num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            loader_pool = ThreadPoolExecutor(max_workers=num_workers)

            def load_images(indices):  # noqa: F811
                return np.stack(list(loader_pool.map(lambda i: dataset[i][0], indices)))

            # native batch prep: JPEG decode in GIL-free threads, then the
            # C++ worker pool fuses crop->resize->normalize for the whole
            # batch (VERDICT r2 item 4: PipelinePool wired into the scan)
            transform = getattr(dataset, "transform", None)
            if hasattr(dataset, "raw_image") and hasattr(transform, "pool_crop"):
                from vit_ed_tpu.native import pipeline as npipe

                if npipe.is_available():
                    native_pool = npipe.PipelinePool(num_workers)
                    post_crop = getattr(transform, "pool_post_crop", None)

                    def load_images(indices):  # noqa: F811
                        raws = list(loader_pool.map(dataset.raw_image, indices))
                        crops, size = [], None
                        for a in raws:
                            pc = transform.pool_crop(a.shape[:2])
                            if pc is None or (size is not None and pc[1] != size):
                                # padding case / ragged sizes: per-sample path
                                return np.stack(list(loader_pool.map(
                                    lambda i: dataset[i][0], indices)))
                            crops.append(pc[0])
                            size = pc[1]
                        batch = native_pool.prep_batch(raws, size, crops)
                        if post_crop is not None:
                            # trailing center-crop commutes with the
                            # pointwise normalize: a plain slice
                            y0, x0, hh, ww = post_crop(size)
                            batch = np.ascontiguousarray(
                                batch[:, y0:y0 + hh, x0:x0 + ww])
                        return batch

        # Column-batch prefetch: the next x2 batch's JPEG decode + crop +
        # normalize runs on a dedicated host thread WHILE the device scores
        # the current tile. Without this the host loads ~batch images
        # (~1 s on this class of host) between every ~4 s device tile —
        # a measured ~20% sustained-rate loss at flagship scale (the
        # round-5 N=2k scan demonstration). One worker, and ALL loads
        # (row and column) route through it, so the native PipelinePool
        # underneath ``load_images`` is never entered concurrently.
        from concurrent.futures import ThreadPoolExecutor as _TPE

        prefetch_pool = _TPE(max_workers=1)
        submit_load = (lambda idx: prefetch_pool.submit(load_images, idx))

        use_token_cache = token_cache
        if use_token_cache is None:
            budget = int(float(os.environ.get(
                "VIT_ED_EVAL_TOKEN_CACHE_GB", "4")) * (1 << 30))
            use_token_cache = (row_shared
                               and self._token_cache_bytes(n) <= budget)
        use_token_cache = bool(use_token_cache) and row_shared

        try:
            start = time.time()
            pairs_done = 0  # newly scored pairs (resume-skipped excluded)
            tok_cache = None
            if use_token_cache:
                # one pass over the dataset: decode + upload + prepare each
                # image ONCE; every later pair chunk indexes the device-
                # resident cache (jnp.take inside score_tokens_row)
                t0 = time.time()
                parts = []
                fut = submit_load(list(range(0, min(batch_size, n))))
                for j0 in range(0, n, batch_size):
                    j1 = min(j0 + batch_size, n)
                    imgs = fut.result()
                    if j1 < n:
                        fut = submit_load(
                            list(range(j1, min(j1 + batch_size, n))))
                    parts.append(self._prepare(
                        self.params, self._pad_batch(imgs))[: j1 - j0])
                tok_cache = jnp.concatenate(parts, axis=0)
                del parts
                if logger:
                    logger.info(
                        f"x2 token cache: {n} images, "
                        f"{self._token_cache_bytes(n) / (1 << 30):.2f} GiB "
                        f"device-resident, built in {time.time() - t0:.0f}s")
            for bi, rows in enumerate(row_blocks):
                if slab_on_disk:
                    # the memmap itself is the persistent score store; a
                    # tiny marker records that this block's rows are final
                    blk_path = os.path.join(
                        out_dir, f"{tag}_rank{rank}_rows{rows.start}.done")
                    if resume and os.path.exists(blk_path):
                        if logger:
                            logger.info(f"Block rows {rows.start}:{rows.stop}"
                                        " complete on disk")
                        continue
                else:
                    blk_path = (os.path.join(
                        out_dir, f"{tag}_rank{rank}_rows{rows.start}.npz")
                        if out_dir else None)
                if (not slab_on_disk and resume and blk_path
                        and os.path.exists(blk_path)):
                    data = np.load(blk_path)
                    cached = data["scores"]
                    want = slab[rows.start - r0:rows.stop - r0].shape
                    if cached.shape == want:
                        slab[rows.start - r0:rows.stop - r0] = cached
                        if logger:
                            logger.info(f"Block rows {rows.start}:{rows.stop} "
                                        "loaded from cache")
                        continue
                    # stale cache from a different dataset/world layout
                    # (e.g. a leftover OUTPUT dir): rescore instead of
                    # crashing — mirrors the reference's is_finished check
                    # semantics (hisfrag.py:181-187)
                    if logger:
                        logger.warning(
                            f"Ignoring stale cache {blk_path}: shape "
                            f"{cached.shape} != {want}")

                i0 = rows.start
                imgs = submit_load(list(rows)).result()
                feats = self._encode(self.params, self._pad_batch(imgs))
                ctx = (self._context_kv(self.params, feats)
                       if (self.use_kv_cache or row_shared) else feats)

                if tok_cache is not None:
                    # device-resident column tokens: the whole block is
                    # pure device work — each row's full upper-triangle
                    # column range, chunked and pipelined by
                    # score_rows_block, gathers from the cache
                    rows_cols = [(i - i0, np.arange(i, n))
                                 for i in range(rows.start, rows.stop)]
                    outs = self.score_rows_block(ctx, tok_cache, rows_cols)
                    for (li, cols), scores in zip(rows_cols, outs):
                        slab[li + i0 - r0, cols] = scores.astype(self.dtype)
                    if blk_path:
                        if slab_on_disk:
                            slab.flush()
                            with open(blk_path, "w"):
                                pass
                        else:
                            np.savez_compressed(
                                blk_path,
                                scores=slab[rows.start - r0:rows.stop - r0])
                    pairs_done += int(
                        np.sum(n - np.arange(rows.start, rows.stop)))
                    if logger and bi % print_freq == 0:
                        frac = (bi + 1) / max(len(row_blocks), 1)
                        elapsed = time.time() - start
                        logger.info(
                            f"Pairwise scan [{bi + 1}/{len(row_blocks)} row "
                            f"blocks] eta {elapsed / frac - elapsed:.0f}s "
                            f"({pairs_done / max(elapsed, 1e-9):.0f} pairs/s)")
                    continue

                # stream x2 column batches from the diagonal onward,
                # double-buffered: batch j0 scores while j0+batch decodes
                col_fut = submit_load(list(range(i0, min(i0 + batch_size, n))))
                pending_drain = None  # previous tile's (drain_all, write)
                for j0 in range(i0, n, batch_size):
                    j1 = min(j0 + batch_size, n)
                    col_imgs = col_fut.result()
                    if j1 < n:
                        col_fut = submit_load(
                            list(range(j1, min(j1 + batch_size, n))))
                    tokens = self._prepare(self.params, self._pad_batch(col_imgs))

                    if row_shared:
                        # row-sharded schedule: per row i, all columns
                        # j >= i of this batch share the row's context
                        rows_cols = [
                            (i - i0, np.arange(max(i, j0), j1))
                            for i in range(rows.start, rows.stop)
                            if max(i, j0) < j1
                        ]
                        outs, drain_all = self.score_rows_block(
                            ctx, tokens,
                            [(li, cols - j0) for li, cols in rows_cols],
                            defer=True)
                        if pending_drain is not None:
                            pending_drain()

                        def write_tile(rows_cols=rows_cols, drain=drain_all):
                            for (li, cols), scores in zip(rows_cols, drain()):
                                slab[li + i0 - r0, cols] = (
                                    scores.astype(self.dtype))

                        pending_drain = write_tile
                        continue

                    # pairs (i, j) with i in rows, j in [j0, j1), i <= j
                    gi, gj = np.meshgrid(np.arange(rows.start, rows.stop),
                                         np.arange(j0, j1), indexing="ij")
                    mask = gi <= gj
                    pri, prj = gi[mask], gj[mask]
                    if len(pri) == 0:
                        continue
                    scores = self.score_pairs_block(ctx, tokens,
                                                    pri - i0, prj - j0)
                    slab[pri - r0, prj] = scores.astype(self.dtype)

                if pending_drain is not None:
                    pending_drain()  # all rows in the slab before the marker

                if blk_path:
                    if slab_on_disk:
                        slab.flush()  # scores durable before the marker
                        with open(blk_path, "w"):
                            pass
                    else:
                        np.savez_compressed(
                            blk_path,
                            scores=slab[rows.start - r0:rows.stop - r0])
                pairs_done += int(
                    np.sum(n - np.arange(rows.start, rows.stop)))
                if logger and bi % print_freq == 0:
                    frac = (bi + 1) / max(len(row_blocks), 1)
                    elapsed = time.time() - start
                    logger.info(
                        f"Pairwise scan [{bi + 1}/{len(row_blocks)} row blocks] "
                        f"eta {elapsed / frac - elapsed:.0f}s "
                        f"({pairs_done / max(elapsed, 1e-9):.0f} pairs/s)")
        finally:
            prefetch_pool.shutdown()
            if loader_pool is not None:
                loader_pool.shutdown()
            if native_pool is not None:
                native_pool.close()

        if not assemble:
            return self._complete_rows(slab, ranges, rank, world_size), my_rows

        sim = np.zeros((n, n, self.num_outputs), self.dtype)
        sim[my_rows.start:my_rows.stop] = slab
        del slab
        if world_size > 1:
            from jax.experimental.multihost_utils import process_allgather

            # gather only each process's row slab (padded to the max slab
            # height), not the full N x N matrix per process
            max_rows = max(r.stop - r.start for r in ranges)
            pad = np.zeros((max_rows,) + sim.shape[1:], self.dtype)
            pad[: my_rows.stop - my_rows.start] = sim[my_rows.start:my_rows.stop]
            gathered = np.asarray(process_allgather(pad))  # [world, max_rows, N, C]
            for r_i, rng_i in enumerate(ranges):
                sim[rng_i.start:rng_i.stop] = gathered[r_i, : rng_i.stop - rng_i.start]

        # mirror to the lower triangle
        out = sim if self.num_outputs > 1 else sim[..., 0]
        lower = np.swapaxes(out, 0, 1)
        il = np.tril_indices(n, -1)
        out[il] = lower[il]
        return out

    def _open_slab(self, out_dir: str, tag: str, rank: int, shape,
                   fresh: bool, logger=None) -> np.memmap:
        """Disk-backed row slab: an ``np.memmap`` under ``out_dir`` whose
        sidecar meta JSON guards resume validity — a stale layout (different
        dataset / world split / dtype) is recreated and its ``.done``
        markers cleared, mirroring the npz stale-cache semantics."""
        import glob
        import json

        os.makedirs(out_dir, exist_ok=True)
        dat = os.path.join(out_dir, f"{tag}_rank{rank}_slab.dat")
        meta_path = dat + ".json"
        meta = {"shape": list(shape), "dtype": np.dtype(self.dtype).name}
        valid = False
        if not fresh and os.path.exists(dat) and os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    valid = json.load(f) == meta
            except (OSError, ValueError):
                valid = False
        if valid:
            return np.memmap(dat, dtype=self.dtype, mode="r+", shape=shape)
        for m in glob.glob(os.path.join(out_dir,
                                        f"{tag}_rank{rank}_rows*.done")):
            os.unlink(m)
        if logger and os.path.exists(dat):
            logger.warning(f"Recreating stale slab {dat}")
        slab = np.memmap(dat, dtype=self.dtype, mode="w+", shape=shape)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        return slab

    def _complete_rows(self, slab: np.ndarray, ranges, rank: int,
                       world_size: int, mirror_block: int = 1024
                       ) -> np.ndarray:
        """Fill the lower-triangle part of this process's rows with the
        mirrored scores held by (possibly other processes') slabs.

        Blocked both ways: cross-process broadcasts travel in
        <= ``mirror_block``-row chunks and writes stream through the slab
        row-major in column bands, so peak extra host memory is
        O(mirror_block x N) at ANY N — no slab-sized broadcast buffers and
        no N^2-sized fancy-index buffers (matters when the slab is a
        ``slab_on_disk`` memmap, where per-column writes would also touch
        every page per column). Returns the slab squeezed like
        score_dataset's assembled output."""
        my_rows = ranges[rank]
        r0 = my_rows.start
        if world_size == 1:
            n = slab.shape[0]
            for a in range(0, n, mirror_block):
                b = min(a + mirror_block, n)
                # off-diagonal bands: rows [a, b) take columns [0, a) from
                # the transposed upper blocks (one streaming read each)
                for c in range(0, a, mirror_block):
                    d = min(c + mirror_block, a)
                    upper = np.asarray(slab[c:d, a:b])
                    slab[a:b, c:d] = np.swapaxes(upper, 0, 1)
                # the diagonal block mirrors in memory
                blk = np.asarray(slab[a:b, a:b])
                il = np.tril_indices(b - a, -1)
                blk[il] = np.swapaxes(blk, 0, 1)[il]
                slab[a:b, a:b] = blk
            return slab if self.num_outputs > 1 else slab[..., 0]

        from jax.experimental.multihost_utils import broadcast_one_to_all

        i_global = r0 + np.arange(slab.shape[0])
        for p, prange in enumerate(ranges):
            # every process walks the same global (p, j0) sequence, so the
            # collective order is identical across processes
            for j0 in range(prange.start, prange.stop, mirror_block):
                j1 = min(j0 + mirror_block, prange.stop)
                pad = np.zeros((mirror_block,) + slab.shape[1:], self.dtype)
                if p == rank:
                    pad[: j1 - j0] = slab[j0 - r0:j1 - r0]
                src = np.asarray(broadcast_one_to_all(pad,
                                                      is_source=(p == rank)))
                # src row j holds scores (j, i) for i >= j; my rows i take
                # the mirror (i, j) <- (j, i) for j < i — one row-major
                # column-band write, keeping the already-scored j >= i part
                mirrored = np.swapaxes(
                    src[: j1 - j0, my_rows.start:my_rows.stop], 0, 1)
                fill = np.arange(j0, j1)[None, :] < i_global[:, None]
                band = np.asarray(slab[:, j0:j1])
                slab[:, j0:j1] = np.where(fill[..., None], mirrored, band)
        return slab if self.num_outputs > 1 else slab[..., 0]

    def score_dense(self, images: np.ndarray, batch_size: int = 128,
                    include_diagonal: bool = False) -> np.ndarray:
        """Score ALL ordered pairs (i, j), i != j, of a modest piece set.

        The TPU-native path behind puzzle evaluation
        (/root/reference/evaluation.py:102-114 scores N(N-1) ordered pairs
        through full pair forwards): here the encoder and the stream-2
        patch embedding run once per piece, and only the cross-decoder
        runs per pair. Returns [N, N, num_outputs] float32 (diagonal zero).
        """
        n = len(images)
        use_kv = self.use_kv_cache or self.row_shared
        # the whole piece set's context_kv block lives on device at once
        # here (unlike score_dataset's per-row-range block): guard against
        # models/piece-counts where [L, n, Sk, 2C] would not fit
        row_shared = self.row_shared
        if row_shared and self._kv_block_bytes(n) > 4 << 30:
            row_shared = False
            use_kv = self.use_kv_cache
        ctx_parts, token_parts = [], []
        for lo in range(0, n, batch_size):
            imgs = self._pad_batch(images[lo:lo + batch_size])
            feats = self._encode(self.params, imgs)
            if use_kv:
                ctx_parts.append(np.asarray(
                    self._context_kv(self.params, feats))[:, : min(batch_size, n - lo)])
            else:
                ctx_parts.append(np.asarray(feats)[: min(batch_size, n - lo)])
            token_parts.append(np.asarray(
                self._prepare(self.params, imgs))[: min(batch_size, n - lo)])
        batch_axis = 1 if use_kv else 0
        context = jnp.asarray(np.concatenate(ctx_parts, axis=batch_axis))
        tokens = jnp.asarray(np.concatenate(token_parts))

        # A pair (i, j) stacks [img_i, img_j]: img_i is the ENCODER/context
        # stream (pair_i indexes feats), img_j the decoder stream (pair_j
        # indexes tokens) — forward_features convention
        # (vision_transformer.py:407-410).
        out = np.zeros((n, n, self.num_outputs), np.float32)
        if row_shared:
            rows_cols = []
            for i in range(n):
                cols = np.arange(n) if include_diagonal else \
                    np.concatenate([np.arange(i), np.arange(i + 1, n)])
                rows_cols.append((i, cols))
            outs = self.score_rows_block(context, tokens, rows_cols)
            for (i, cols), scores in zip(rows_cols, outs):
                out[i, cols] = scores
            return out

        gi, gj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        if include_diagonal:
            mask = np.ones_like(gi, dtype=bool)
        else:
            mask = gi != gj
        pi, pj = gi[mask], gj[mask]
        scores = self.score_pairs_block(context, tokens, pair_i=pi, pair_j=pj)
        out[pi, pj] = scores
        return out

    def _pad_batch(self, imgs: np.ndarray) -> jnp.ndarray:
        """Pad the batch to a device-count multiple for even sharding."""
        b = imgs.shape[0]
        b_pad = _round_up(b, self.n_devices)
        if b_pad != b:
            imgs = np.concatenate(
                [imgs, np.zeros((b_pad - b,) + imgs.shape[1:], imgs.dtype)])
        return jnp.asarray(imgs)
