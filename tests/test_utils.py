import numpy as np

from vit_ed_tpu.utils.misc import (
    AverageMeter,
    chunks,
    compute_distance_matrix,
    cosine_distance_np,
    get_combinations,
    get_repeated_indexes,
    list_to_idx,
    n_batches,
    split_list_by_ratios,
)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, n=2)
    m.update(4.0)
    assert m.count == 3
    assert abs(m.avg - (2 * 2 + 4) / 3) < 1e-9
    m.all_reduce()  # single process: no-op
    assert m.count == 3


def test_chunks_striped():
    out = chunks(list(range(7)), 3)
    assert out[0] == [0, 3, 6]
    assert out[1] == [1, 4]
    assert out[2] == [2, 5]


def test_list_to_idx():
    labels = list_to_idx(["a_1", "a_2", "b_1"], lambda x: x.split("_")[0])
    assert labels[0] == labels[1]
    assert labels[0] != labels[2]


def test_get_combinations():
    c = get_combinations(np.array([0, 1]), np.array([5, 6]))
    assert c.tolist() == [[0, 5], [0, 6], [1, 5], [1, 6]]


def test_cosine_distance():
    a = np.array([[1.0, 0.0], [0.0, 1.0]])
    b = np.array([[1.0, 0.0], [1.0, 0.0]])
    d = cosine_distance_np(a, b)
    assert abs(d[0]) < 1e-9
    assert abs(d[1] - 1.0) < 1e-9


def test_compute_distance_matrix():
    data = {
        "f2": np.array([[0.0, 1.0]]),
        "f1": np.array([[1.0, 0.0], [1.0, 0.0]]),
    }
    matrix, names = compute_distance_matrix(data, reduction="mean")
    assert names == ["f1", "f2"]
    assert matrix.shape == (2, 2)
    assert abs(matrix[0, 0]) < 1e-9          # f1 vs f1: identical rows
    assert abs(matrix[0, 1] - 1.0) < 1e-9    # orthogonal
    assert abs(matrix[0, 1] - matrix[1, 0]) < 1e-12


def test_split_list_by_ratios():
    out = split_list_by_ratios(list(range(10)), [0.5, 0.5])
    assert out[0] == [0, 1, 2, 3, 4]
    assert out[1] == [5, 6, 7, 8, 9]


def test_repeated_indexes_and_n_batches():
    idx = get_repeated_indexes(3, 7)
    assert len(idx) == 7
    assert set(idx) <= {0, 1, 2}
    assert n_batches(4) == 10          # upper triangle with diagonal
    assert n_batches(4, 2) == 4 + 3    # pairs before row 2
