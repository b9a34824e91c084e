"""mAP / Pr@k with explicit positive/negative pair sets (Geshaem variant).

Semantic parity with /root/reference/misc/metric.py:4-50, re-implemented
with vectorized per-query numpy (membership masks + cumulative sums
instead of Python item loops). Ground truth is group membership rather
than flat labels; when ``negative_pairs`` is given, ranked items outside
the query's positive/negative sets are dropped from the ranking before
scoring (the reference's curated-pair evaluation protocol).

Per query q (its own column ranks first at distance 0 and is skipped):
- AP  = mean over positive hits of (num positives so far) / rank
- Pr@k = (positives in the top k of the filtered ranking, query excluded)
         / min(total positives retrieved, k)
Queries whose ranking contains no positive at all are dropped (ground
truth gaps).
"""

from __future__ import annotations

import numpy as np


def _membership_row(labels, group) -> np.ndarray:
    """Boolean mask over ``labels`` of items whose label is in ``group``."""
    group = set(group)
    return np.fromiter((l in group for l in labels), bool, len(labels))


def calc_map_prak(distances, labels, positive_pairs, negative_pairs=None,
                  prak=(1, 5)):
    distances = np.asarray(distances)
    labels = list(labels)
    n = len(labels)

    # membership masks depend only on the QUERY's label: build once per
    # unique label instead of per query
    pos_rows, keep_rows = {}, {}
    for lab in set(labels):
        pos_rows[lab] = _membership_row(labels, positive_pairs[lab])
        if negative_pairs is not None:
            keep_rows[lab] = (pos_rows[lab]
                              | _membership_row(labels, negative_pairs[lab]))

    aps = []
    praks = [[] for _ in prak]
    for i in range(n):
        lab = labels[i]
        order = np.argsort(distances[i]).ravel()
        if negative_pairs is not None:
            order = order[keep_rows[lab][order]]
        # drop the ranking's first slot (the query itself at distance 0)
        hits = pos_rows[lab][order][1:]
        n_pos = int(np.count_nonzero(hits))
        if n_pos == 0:
            continue  # no positive retrieved: ground-truth gap, skip query
        ranks = np.flatnonzero(hits) + 1
        aps.append(float(np.mean(np.arange(1, n_pos + 1) / ranks)))
        for k_i, k in enumerate(prak):
            praks[k_i].append(
                int(np.count_nonzero(hits[:k])) / min(n_pos, k))

    if not aps:
        # every query lacked a retrieved positive: fail loudly (NaN here
        # would silently poison the trainer's min-loss / best-checkpoint
        # tracking; the reference loop raised ZeroDivisionError)
        raise ValueError(
            "calc_map_prak: no query retrieved any positive — check the "
            "positive_pairs ground truth against the ranked labels")
    m_ap = float(np.mean(aps))
    return m_ap, tuple(float(np.mean(p)) for p in praks)
