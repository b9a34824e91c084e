"""Row-sharded wi19 metrics for very large retrieval scans.

At HisFrag20 scale (N ~ 20k) the full float16 similarity matrix is
~800 MB per process — fine. Past N ~ 50k the assembled N x N matrix
dominates host memory, so this module evaluates the ICFHR-2020 metrics
from ROW SLABS: every wi19 statistic in ``wi19.get_metrics`` is a
per-query (per-row) quantity followed by a mean over rows, so each
process reduces its own complete rows to small partial sums and the
final merge is O(1) communication.

Usage (single or multi process):

    part = row_partials(D_rows, labels)       # D_rows: my complete rows
    m_ap, top1, pr10, pr100 = merge_partials([part_0, ..., part_{W-1}])

Semantics match ``wi19.get_metrics`` exactly, including the upstream
quirks: mAP excludes singleton queries, Pr@k is nan when any singleton
query exists (0/0 propagates, as in wi19_evaluate.py:7-9), and the self
column is removed per row by the argsort (the zero self-distance sorts
first). Equivalence vs the unsharded evaluator is asserted in
tests/test_metrics_sharded.py.
"""

from __future__ import annotations

import numpy as np

from .wi19 import get_precision_recall_matrices


def row_partials(distance_rows: np.ndarray, labels: np.ndarray,
                 row_labels: np.ndarray | None = None,
                 remove_self_column: bool = True) -> dict:
    """Partial sums of the wi19 metrics over a slab of complete rows.

    Args:
        distance_rows: [R, N] distances for R query rows (each row full).
        labels: [N] class labels for ALL columns.
        row_labels: [R] labels of the slab's rows (defaults to ``labels``
            when the slab is the full square matrix).
    """
    labels = np.asarray(labels)
    if row_labels is None:
        row_labels = labels
    row_labels = np.asarray(row_labels)
    correct = labels[None, :] == row_labels[:, None]
    precision_at, _recall, sorted_retrievals = get_precision_recall_matrices(
        distance_rows, None, remove_self_column, correct_retrievals=correct)

    relevant = sorted_retrievals.sum(axis=1)
    non_singleton = relevant > 0
    ap = np.zeros(len(sorted_retrievals))
    ap[non_singleton] = ((precision_at * sorted_retrievals).sum(axis=1)[non_singleton]
                         / relevant[non_singleton])

    def prk_sum(k):
        with np.errstate(divide="ignore", invalid="ignore"):
            pr = (sorted_retrievals[:, :k].sum(axis=1)
                  / np.minimum(relevant, k))
        return float(pr.sum())  # nan propagates, as upstream

    return {
        "ap_sum": float(ap[non_singleton].sum()),
        "n_non_singleton": int(non_singleton.sum()),
        "top1_sum": float(sorted_retrievals[:, 0].sum()),
        "n_rows": int(len(sorted_retrievals)),
        "pr10_sum": prk_sum(10),
        "pr100_sum": prk_sum(100),
    }


def merge_partials(partials) -> tuple:
    """-> (mAP, top-1, Pr@10, Pr@100), identical to wi19.get_metrics."""
    tot = {k: sum(p[k] for p in partials) for k in partials[0]}
    if tot["n_non_singleton"] == 0:
        # all-singleton queries: wi19.get_metrics' mAP is the mean of an
        # empty array (nan) — match that exactly rather than returning 0
        m_ap = float("nan")
    else:
        m_ap = tot["ap_sum"] / tot["n_non_singleton"]
    top1 = tot["top1_sum"] / max(tot["n_rows"], 1)
    pr10 = tot["pr10_sum"] / max(tot["n_rows"], 1)
    pr100 = tot["pr100_sum"] / max(tot["n_rows"], 1)
    return m_ap, top1, pr10, pr100
