import random

from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.evaluation import (
    compute_direct_accuracy,
    compute_neighbor_accuracy,
)
from vit_ed_tpu.solver.importer import PuzzleTester
from vit_ed_tpu.solver.piece import PuzzlePiece


def test_standalone_accuracies_on_perfect_solve():
    puzzle = PuzzleTester.build_dummy_puzzle()
    pieces = list(puzzle.pieces)
    random.Random(0).shuffle(pieces)
    solved = paikin_tal_driver(pieces, PuzzleTester.PIECE_WIDTH,
                               PuzzlePiece.calculate_asymmetric_distance,
                               puzzle.grid_size)
    assert compute_direct_accuracy(solved) == 1.0
    assert compute_neighbor_accuracy(solved) == 1.0
