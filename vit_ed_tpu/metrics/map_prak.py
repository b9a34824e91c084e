"""mAP / Pr@k with explicit positive/negative pair sets (Geshaem variant,
/root/reference/misc/metric.py:4-50). Ground truth is group membership
rather than flat labels; items outside pos/neg sets are filtered out."""

from __future__ import annotations

import numpy as np


def calc_map_prak(distances, labels, positive_pairs, negative_pairs=None,
                  prak=(1, 5)):
    avg_precision = []
    prak_res = [[] for _ in prak]

    for i in range(len(distances)):
        cur_dists = distances[i, :]
        idxs = np.argsort(cur_dists).flatten()
        sorted_labels = np.asarray(labels)[idxs].tolist()
        pos_labels = positive_pairs[labels[i]]
        if negative_pairs is not None:
            neg_labels = negative_pairs[labels[i]]
            for li, label in reversed(list(enumerate(sorted_labels))):
                if label not in pos_labels and label not in neg_labels:
                    del sorted_labels[li]

        cur_sum = []
        pos_count = 1
        correct_count = []
        for idx, label in enumerate(sorted_labels):
            if idx == 0:
                continue  # first item is the query itself
            if label in pos_labels:
                cur_sum.append(float(pos_count) / idx)
                pos_count += 1
                correct_count.append(1)
            else:
                correct_count.append(0)

        if sum(correct_count) == 0:
            # No positive pair found: likely a ground-truth gap; skip query.
            continue

        for k_i, k in enumerate(prak):
            val = sum(correct_count[:k]) / min(sum(correct_count), k)
            prak_res[k_i].append(val)

        ap = sum(cur_sum) / len(cur_sum)
        avg_precision.append(ap)

    m_ap = sum(avg_precision) / len(avg_precision)
    out = []
    for k_i, _ in enumerate(prak):
        out.append(sum(prak_res[k_i]) / len(prak_res[k_i]))
    return m_ap, tuple(out)
