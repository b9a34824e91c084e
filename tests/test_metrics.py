import numpy as np

from vit_ed_tpu.metrics import calc_map_prak, get_metrics


def test_wi19_perfect_retrieval():
    # 3 writers x 2 samples; distances 0 within writer, 1 across
    labels = np.array([0, 0, 1, 1, 2, 2])
    D = 1.0 - (labels[None, :] == labels[:, None]).astype(float)
    np.fill_diagonal(D, 0.0)
    m_ap, top1, pr10, pr100 = get_metrics(D, labels)
    assert m_ap == 1.0
    assert top1 == 1.0
    assert pr10 == 1.0
    assert pr100 == 1.0


def test_wi19_known_values():
    """Hand-computed mAP for a 4-sample case."""
    labels = np.array([0, 0, 1, 1])
    # query 0 ranks: [1(pos), 2, 3]; query 1: [0(pos), ...]
    D = np.array([
        [0.0, 0.1, 0.2, 0.3],
        [0.1, 0.0, 0.2, 0.3],
        [0.2, 0.3, 0.0, 0.5],   # query 2: nearest non-self is 0 (neg), then 1, then 3 (pos @3)
        [0.2, 0.3, 0.1, 0.0],   # query 3: nearest non-self 2 (pos @1)
    ])
    m_ap, top1, _, _ = get_metrics(D, labels)
    # AP: q0=1, q1=1, q2=1/3, q3=1
    assert abs(m_ap - (1 + 1 + 1 / 3 + 1) / 4) < 1e-9
    assert abs(top1 - 3 / 4) < 1e-9


def test_wi19_singleton_excluded_from_map():
    labels = np.array([0, 0, 7])  # writer 7 is a singleton
    D = np.array([
        [0.0, 0.1, 0.9],
        [0.1, 0.0, 0.9],
        [0.9, 0.9, 0.0],
    ])
    m_ap, top1, _, _ = get_metrics(D, labels)
    assert m_ap == 1.0          # singleton query dropped
    assert abs(top1 - 2 / 3) < 1e-9  # but counted in top-1


def _map_prak_oracle(distances, labels, positive_pairs, negative_pairs=None,
                     prak=(1, 5)):
    """Item-loop oracle transcribed from the reference evaluator
    (/root/reference/misc/metric.py:4-50) — kept HERE, test-only, as the
    parity target for the vectorized implementation."""
    avg_precision = []
    prak_res = [[] for _ in prak]
    for i in range(len(distances)):
        idxs = np.argsort(distances[i, :]).flatten()
        sorted_labels = np.asarray(labels)[idxs].tolist()
        pos_labels = positive_pairs[labels[i]]
        if negative_pairs is not None:
            neg_labels = negative_pairs[labels[i]]
            sorted_labels = [l for l in sorted_labels
                             if l in pos_labels or l in neg_labels]
        cur_sum, pos_count, correct = [], 1, []
        for idx, label in enumerate(sorted_labels):
            if idx == 0:
                continue
            if label in pos_labels:
                cur_sum.append(float(pos_count) / idx)
                pos_count += 1
                correct.append(1)
            else:
                correct.append(0)
        if sum(correct) == 0:
            continue
        for k_i, k in enumerate(prak):
            prak_res[k_i].append(sum(correct[:k]) / min(sum(correct), k))
        avg_precision.append(sum(cur_sum) / len(cur_sum))
    return (sum(avg_precision) / len(avg_precision),
            tuple(sum(p) / len(p) for p in prak_res))


def test_calc_map_prak_matches_reference_oracle():
    """Fuzz the vectorized calc_map_prak against the transcribed
    reference-semantics oracle, with and without negative pair sets."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(5, 25))
        labels = [f"it{j}" for j in range(n)]
        groups = rng.integers(0, max(2, n // 3), size=n)
        positive_pairs = {
            labels[j]: {labels[k] for k in range(n)
                        if groups[k] == groups[j] and k != j}
            for j in range(n)}
        # negatives: a random subset of the non-positives
        negative_pairs = {
            labels[j]: {labels[k] for k in range(n)
                        if groups[k] != groups[j] and rng.random() < 0.6}
            for j in range(n)}
        D = rng.random((n, n))
        D = (D + D.T) / 2
        np.fill_diagonal(D, 0.0)
        for negs in (None, negative_pairs):
            try:
                want = _map_prak_oracle(D, labels, positive_pairs, negs,
                                        prak=(1, 3, 5))
            except ZeroDivisionError:
                continue  # no query scored at all: undefined either way
            got = calc_map_prak(D, labels, positive_pairs, negs,
                                prak=(1, 3, 5))
            np.testing.assert_allclose(got[0], want[0], rtol=1e-12)
            np.testing.assert_allclose(got[1], want[1], rtol=1e-12)


def test_calc_map_prak_groups():
    labels = ["a", "b", "c", "d"]
    positive_pairs = {"a": {"b"}, "b": {"a"}, "c": {"d"}, "d": {"c"}}
    D = np.array([
        [0.0, 0.1, 0.5, 0.6],
        [0.1, 0.0, 0.5, 0.6],
        [0.5, 0.6, 0.0, 0.1],
        [0.6, 0.5, 0.1, 0.0],
    ])
    m_ap, (pr1, pr5) = calc_map_prak(D, labels, positive_pairs)
    assert m_ap == 1.0
    assert pr1 == 1.0


def test_calc_map_prak_raises_when_no_positives_retrieved():
    """When EVERY query lacks a retrieved positive the metric fails
    loudly instead of returning NaN (which would silently poison the
    trainer's min-loss / best-checkpoint tracking)."""
    import pytest

    D = np.asarray([[0.0, 0.3], [0.3, 0.0]])
    labels = ["a", "b"]
    # positive sets name only labels absent from the ranking
    positive_pairs = {"a": {"zzz"}, "b": {"zzz"}}
    with pytest.raises(ValueError, match="no query retrieved"):
        calc_map_prak(D, labels, positive_pairs, None)
