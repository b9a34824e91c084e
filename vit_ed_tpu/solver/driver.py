"""Solver driver (reference solver_driver.py:15-33)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .importer import Puzzle, PuzzleType
from .piece import PuzzlePiece
from .solver import PaikinTalSolver


def paikin_tal_driver(pieces: Sequence[PuzzlePiece], piece_width: int,
                      distance_fn: Optional[Callable] = None,
                      fixed_puzzle_dimensions=None,
                      distances: Optional[np.ndarray] = None) -> Puzzle:
    """Build the solver, run it, reconstruct the single output puzzle.

    ``distances`` may carry a precomputed [4, N, N] tensor (e.g. batched
    NN pair scores computed on device) — the TPU-native fast path replacing
    the per-pair distance_function callbacks."""
    solver = PaikinTalSolver(1, pieces, distance_fn, PuzzleType.type1, 0,
                             fixed_puzzle_dimensions, distances=distances)
    solver.run()
    paikin_tal_results, _ = solver.get_solved_puzzles()
    puzzle_pieces = paikin_tal_results[0]
    puzzle_id = puzzle_pieces[0].puzzle_id
    return Puzzle.reconstruct_from_pieces(puzzle_pieces, piece_width, puzzle_id)
