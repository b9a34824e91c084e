"""Native C++ placement core vs the Python reference solver."""

import numpy as np
import pytest

from vit_ed_tpu import native
from vit_ed_tpu.solver.distance import classical_distance_matrix
from vit_ed_tpu.solver.importer import PuzzleTester, PuzzleType
from vit_ed_tpu.solver.solver import PaikinTalSolver

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


def _python_solve(distances, fixed_dims):
    pieces = PuzzleTester.build_dummy_puzzle().pieces  # ids/locs reused
    n = distances.shape[1]
    pieces = pieces[:n]
    solver = PaikinTalSolver(1, pieces, None, PuzzleType.type1, 0.0, fixed_dims,
                             distances=distances)
    solver.run()
    rows = np.full(n, -1)
    cols = np.full(n, -1)
    for p in pieces:
        rows[p.id_number] = p.location[0]
        cols[p.id_number] = p.location[1]
    rows -= rows.min()
    cols -= cols.min()
    return rows, cols


def test_native_matches_python_on_dummy():
    puzzle = PuzzleTester.build_dummy_puzzle()
    D = classical_distance_matrix(puzzle.pieces)
    rows_p, cols_p = _python_solve(D.copy(), puzzle.grid_size)
    rows_n, cols_n, pids, _bb = native.pt_solve(D, puzzle.grid_size, 1, 0.0)
    np.testing.assert_array_equal(rows_n, rows_p)
    np.testing.assert_array_equal(cols_n, cols_p)
    assert (pids == 0).all()


def test_native_matches_python_on_random():
    rng = np.random.default_rng(0)
    n = 9
    for trial in range(5):
        D = rng.uniform(1.0, 100.0, size=(4, n, n))
        rows_p, cols_p = _python_solve(D.copy(), None)
        rows_n, cols_n, _, _bb = native.pt_solve(D, None, 1, 0.0)
        np.testing.assert_array_equal(rows_n, rows_p, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(cols_n, cols_p, err_msg=f"trial {trial}")


def test_native_perfect_reassembly():
    puzzle = PuzzleTester.build_dummy_puzzle()
    D = classical_distance_matrix(puzzle.pieces)
    rows, cols, pids, _bb = native.pt_solve(D, puzzle.grid_size, 1, 0.0)
    # sequential-pixel puzzle must reassemble exactly
    for i in range(9):
        assert (rows[i], cols[i]) == (i // 3, i % 3)


# ------------------------------------------------------------- type-2 core
def _python_solve2(distances, fixed_dims, n):
    from vit_ed_tpu.solver.piece import PuzzlePiece

    rng_img = np.zeros((8, 8, 3), np.uint8)
    pieces = [PuzzlePiece(0, (i, 0), rng_img.copy(), piece_id=i,
                          puzzle_grid_size=(n, 1)) for i in range(n)]
    solver = PaikinTalSolver(1, pieces, None, PuzzleType.type2, 0.0,
                             fixed_dims, distances=distances)
    solver.run()
    rows = np.full(n, -1)
    cols = np.full(n, -1)
    rots = np.full(n, -1)
    for p in pieces:
        rows[p.id_number] = p.location[0]
        cols[p.id_number] = p.location[1]
        rots[p.id_number] = p.rotation.value // 90
    rows -= rows.min()
    cols -= cols.min()
    return rows, cols, rots


def test_native_type2_matches_python_on_random():
    rng = np.random.default_rng(1)
    n = 9
    for trial in range(5):
        D = rng.uniform(1.0, 100.0, size=(4, n, 4, n))
        rows_p, cols_p, rots_p = _python_solve2(D.copy(), None, n)
        rows_n, cols_n, pids, rots_n, _bb = native.pt_solve2(D, None, 1, 0.0)
        np.testing.assert_array_equal(rows_n, rows_p, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(cols_n, cols_p, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(rots_n, rots_p, err_msg=f"trial {trial}")
        assert (pids == 0).all()


def test_native_type2_recovers_physical_rotations():
    from tests.test_type2 import _adjacency_preserved, _grid_image, _make_pieces
    from vit_ed_tpu.solver.distance import classical_distance_matrix_type2
    from vit_ed_tpu.solver.piece import PuzzlePieceRotation

    img = _grid_image(3, 4, 8)
    rng = np.random.default_rng(3)
    ks = rng.integers(0, 4, size=12)
    pieces = _make_pieces(img, 8, rotations=ks)
    D = classical_distance_matrix_type2(pieces)
    rows, cols, pids, rots, _bb = native.pt_solve2(D, None, 1, 0.0)
    for i, p in enumerate(pieces):
        p.puzzle_id = int(pids[i])
        p.location = (int(rows[i]), int(cols[i]))
        p.rotation = PuzzlePieceRotation(int(rots[i]) * 90)
    assert _adjacency_preserved(pieces) == 1.0
    combo_a = {(int(rots[i]) + int(ks[i])) % 4 for i in range(12)}
    combo_b = {(int(rots[i]) - int(ks[i])) % 4 for i in range(12)}
    assert len(combo_a) == 1 or len(combo_b) == 1
