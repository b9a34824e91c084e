"""Solver tests modeled on the reference's closed-form fixtures
(puzzle_importer_tester.py / paikin_tal_tester.py, SURVEY.md §4)."""

import math

import numpy as np
import pytest

from vit_ed_tpu.solver.distance import (
    CompatibilityEngine,
    classical_distance_matrix,
    distance_matrix_from_function,
    distance_matrix_from_predictions,
)
from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.importer import Puzzle, PuzzleTester, PuzzleType
from vit_ed_tpu.solver.piece import PuzzlePiece, PuzzlePieceRotation, PuzzlePieceSide
from vit_ed_tpu.solver.solver import PaikinTalSolver

Side = PuzzlePieceSide


@pytest.fixture(scope="module")
def dummy_puzzle():
    return PuzzleTester.build_dummy_puzzle()


def test_dummy_puzzle_structure(dummy_puzzle):
    assert len(dummy_puzzle.pieces) == 9
    assert dummy_puzzle.grid_size == (3, 3)
    assert dummy_puzzle.pieces[0].width == PuzzleTester.PIECE_WIDTH


def test_true_neighbors_have_zero_distance(dummy_puzzle):
    """Sequential pixels -> border extrapolation is exact for true
    neighbors (reference paikin_tal_tester.py:14-44)."""
    pieces = dummy_puzzle.pieces
    # piece 0 and piece 1 are left/right neighbors
    d = PuzzlePiece.calculate_asymmetric_distance(pieces[0], Side.right,
                                                  pieces[1], Side.left)
    assert d == 0
    # piece 0 and piece 3 are top/bottom neighbors
    d = PuzzlePiece.calculate_asymmetric_distance(pieces[0], Side.bottom,
                                                  pieces[3], Side.top)
    assert d == 0
    # non-neighbors are nonzero
    d = PuzzlePiece.calculate_asymmetric_distance(pieces[0], Side.right,
                                                  pieces[2], Side.left)
    assert d > 0


def test_vectorized_matches_loop_distance(dummy_puzzle):
    """The vectorized classical distance equals the per-pair function for
    every type-1 (i, side, j) triple."""
    pieces = dummy_puzzle.pieces
    D_vec = classical_distance_matrix(pieces)
    D_loop = distance_matrix_from_function(
        pieces, PuzzlePiece.calculate_asymmetric_distance)
    n = len(pieces)
    for s in range(4):
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                assert D_vec[s, i, j] == D_loop[s, i, j], (s, i, j)


def test_best_buddies_are_symmetric(dummy_puzzle):
    eng = CompatibilityEngine(classical_distance_matrix(dummy_puzzle.pieces))
    for i in range(9):
        for s in Side.get_all_sides():
            for (j, js) in eng.best_buddies(i, s):
                back = eng.best_buddies(j, js)
                assert (i, s) in [(b, bs) for b, bs in back]


def test_true_neighbors_are_best_buddies(dummy_puzzle):
    eng = CompatibilityEngine(classical_distance_matrix(dummy_puzzle.pieces))
    # piece 4 (center) should have all four true neighbors as best buddies
    assert eng.best_buddies(4, Side.top) == [(1, Side.bottom)]
    assert eng.best_buddies(4, Side.right) == [(5, Side.left)]
    assert eng.best_buddies(4, Side.bottom) == [(7, Side.top)]
    assert eng.best_buddies(4, Side.left) == [(3, Side.right)]


def test_start_piece_is_center(dummy_puzzle):
    """The center piece has 4 best buddies each rich in buddies, so it
    should rank first (inter_piece_distance.py:650-735)."""
    eng = CompatibilityEngine(classical_distance_matrix(dummy_puzzle.pieces))
    assert eng.next_starting_piece() == 4


def test_solver_perfectly_reassembles_dummy(dummy_puzzle):
    import random

    pieces = list(dummy_puzzle.pieces)
    random.Random(0).shuffle(pieces)
    new_puzzle = paikin_tal_driver(pieces, PuzzleTester.PIECE_WIDTH,
                                   PuzzlePiece.calculate_asymmetric_distance,
                                   dummy_puzzle.grid_size)
    # every piece correctly placed (relative to upper-left normalization)
    locs = {p.original_piece_id: p.location for p in new_puzzle.pieces}
    grid = int(math.sqrt(len(pieces)))
    for pid, loc in locs.items():
        assert loc == (pid // grid, pid % grid)
    for p in new_puzzle.pieces:
        assert p.rotation == PuzzlePieceRotation.degree_0


def test_accuracy_metrics_perfect(dummy_puzzle):
    import random

    from vit_ed_tpu.solver.importer import (
        PuzzleResultsCollection,
        PuzzleSolver,
    )

    pieces = list(dummy_puzzle.pieces)
    random.Random(1).shuffle(pieces)
    new_puzzle = paikin_tal_driver(pieces, PuzzleTester.PIECE_WIDTH,
                                   PuzzlePiece.calculate_asymmetric_distance,
                                   dummy_puzzle.grid_size)
    collection = PuzzleResultsCollection(PuzzleSolver.PaikinTal, PuzzleType.type1,
                                         [new_puzzle.pieces], ["dummy"] )
    collection.calculate_accuracies([new_puzzle])
    result, perfect = collection.collect_results()
    assert result["Direct_Standard"][0] == 1.0
    assert result["Direct_Modified"][0] == 1.0
    assert perfect == [True]
    # neighbor accuracy: interior sides all correct; edge sides with None
    # neighbors also count as correct
    assert result["neighbor"][0] == 1.0


def test_prediction_distance_routing():
    """evaluation.py:116-131 side routing of the 4-bin predictions."""
    preds = np.zeros((2, 2, 4))
    preds[0, 1] = [0.9, 0.1, 0.2, 0.3]  # j right-of i with p=.9
    D = distance_matrix_from_predictions(preds)
    assert np.isclose(D[Side.right.value, 0, 1], 0.1 * 1000)
    assert np.isclose(D[Side.bottom.value, 0, 1], 0.9 * 1000)
    assert np.isclose(D[Side.left.value, 0, 1], 0.8 * 1000)
    assert np.isclose(D[Side.top.value, 0, 1], 0.7 * 1000)


def test_rotation_algebra():
    """puzzle_piece rotation math (puzzle_importer_tester.py:195-288)."""
    r = PuzzlePiece._calculate_placed_piece_rotation(
        Side.left, Side.right, PuzzlePieceRotation.degree_0)
    assert r == PuzzlePieceRotation.degree_0
    r = PuzzlePiece._calculate_placed_piece_rotation(
        Side.top, Side.right, PuzzlePieceRotation.degree_0)
    assert r == PuzzlePieceRotation.degree_270
    s = PuzzlePiece._determine_unrotated_side(PuzzlePieceRotation.degree_90, Side.top)
    assert s == Side.left


def test_neighbor_ids_from_grid(dummy_puzzle):
    p0 = dummy_puzzle.pieces[0]
    ids = dict((side, nid) for nid, side in p0.original_neighbor_id_numbers_and_sides)
    assert ids[Side.top] is None
    assert ids[Side.left] is None
    assert ids[Side.right] == 1
    assert ids[Side.bottom] == 3
