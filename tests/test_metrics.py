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
