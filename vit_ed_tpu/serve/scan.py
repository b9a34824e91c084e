"""Headless retrieval scan from a serving bundle — zero model code.

The signature workload (the sharded O(N^2) pair scan,
/root/reference/hisfrag.py:161-302) driven entirely from an exported
bundle: encode + kv once per row block, prepare once per column batch,
score_row per row — the same amortisation schedule as
``parallel/pairs.py`` (the training-framework twin), but every device
computation is a deserialized ``jax.export`` artifact. A serving tier
needs only the bundle directory and the images.
"""

from __future__ import annotations

import numpy as np

from .export import ExportedScorer

__all__ = ["scan_pairs"]


def scan_pairs(scorer: ExportedScorer, images, batch_size: int = 8,
               dtype=np.float16) -> np.ndarray:
    """Full symmetric pair score matrix for ``images`` ([N, H, W, 3]).

    Returns [N, N] (or [N, N, C] for multi-logit heads) in ``dtype``,
    mirroring score_dataset's assembled output. Row/column batches pad
    up to a servable batch (mesh-divisible or bucketed) and truncate.
    """
    import jax.numpy as jnp

    n = len(images)
    if n == 0:
        return np.zeros((0, 0), dtype)

    def pad_to(arr, b):
        if arr.shape[0] == b:
            return jnp.asarray(arr)
        pad = np.zeros((b - arr.shape[0],) + tuple(arr.shape[1:]),
                       np.asarray(arr[:1]).dtype)
        return jnp.asarray(np.concatenate([np.asarray(arr), pad]))

    sim = None
    for i0 in range(0, n, batch_size):
        i1 = min(i0 + batch_size, n)
        bi = scorer.servable_batch(i1 - i0)
        feats = scorer("encode", pad_to(images[i0:i1], bi))
        kv = np.asarray(scorer("kv", feats))[:, : i1 - i0]
        for j0 in range(i0, n, batch_size):
            j1 = min(j0 + batch_size, n)
            bj = scorer.servable_batch(j1 - j0)
            tokens = np.asarray(
                scorer("prepare", pad_to(images[j0:j1], bj)))[: j1 - j0]
            for i in range(i0, i1):
                lo = max(i, j0)
                if lo >= j1:
                    continue
                cols = np.arange(lo, j1)
                bc = scorer.servable_batch(len(cols))
                out = np.asarray(scorer(
                    "score_row", jnp.asarray(kv[:, i - i0: i - i0 + 1]),
                    pad_to(tokens[cols - j0], bc)))[: len(cols)]
                if sim is None:
                    c = out.shape[-1]
                    sim = np.zeros((n, n, c), dtype)
                sim[i, cols] = out.astype(dtype)
    # mirror to the lower triangle
    out = sim if sim.shape[-1] > 1 else sim[..., 0]
    il = np.tril_indices(n, -1)
    out[il] = np.swapaxes(out, 0, 1)[il]
    return out
