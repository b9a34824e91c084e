"""Multi-board spawning (solver.py:244-249, 507-518): when pieces come from
two unrelated puzzles, a low-compatibility placement should spawn a second
board rather than gluing the puzzles together."""

import numpy as np

from vit_ed_tpu.solver.importer import PuzzleType
from vit_ed_tpu.solver.piece import PuzzlePiece
from vit_ed_tpu.solver.solver import PaikinTalSolver


def _sequential_pieces(start_value, grid=2, width=5, puzzle_id=0, id_offset=0):
    """Pieces from a sequential-pixel image (PuzzleTester pattern)."""
    n = grid * width
    img = (start_value
           + np.arange(n * n * 3, dtype=np.float64).reshape(n, n, 3))
    pieces = []
    pid = id_offset
    for r in range(grid):
        for c in range(grid):
            sub = img[r * width:(r + 1) * width, c * width:(c + 1) * width, :]
            pieces.append(PuzzlePiece(puzzle_id, (r, c), sub.copy(), piece_id=pid,
                                      puzzle_grid_size=(grid, grid)))
            pid += 1
    return pieces


def test_two_puzzles_spawn_two_boards():
    # Two sequential puzzles with very different value ranges: cross-puzzle
    # distances are huge, within-puzzle true-neighbor distances are 0.
    pieces_a = _sequential_pieces(0.0, puzzle_id=0, id_offset=0)
    pieces_b = _sequential_pieces(100000.0, puzzle_id=1, id_offset=4)
    pieces = pieces_a + pieces_b

    solver = PaikinTalSolver(2, pieces, PuzzlePiece.calculate_asymmetric_distance,
                             PuzzleType.type1, new_board_mutual_compatibility=0.5)
    solver.run()
    solved, unassigned = solver.get_solved_puzzles()
    assert not unassigned
    assert len(solved) == 2
    assert all(len(s) == 4 for s in solved)
    # each output board holds pieces from exactly one original puzzle
    for board in solved:
        orig = {p.original_puzzle_id for p in board}
        assert len(orig) == 1
