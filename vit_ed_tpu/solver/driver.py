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
                      distances: Optional[np.ndarray] = None,
                      use_native: Optional[bool] = None) -> Puzzle:
    """Build the solver, run it, reconstruct the single output puzzle.

    ``distances`` may carry a precomputed [4, N, N] tensor (e.g. batched
    NN pair scores computed on device) — the TPU-native fast path replacing
    the per-pair distance_function callbacks. With a precomputed tensor the
    placement loop runs in the native C++ core (vit_ed_tpu/native) when
    available; pass use_native=False to force the Python reference loop."""
    if use_native is None:
        use_native = distances is not None
    if use_native and distances is not None:
        from vit_ed_tpu import native

        if native.is_available():
            return _native_driver(pieces, piece_width, distances,
                                  fixed_puzzle_dimensions)
    puzzle_type = (PuzzleType.type2
                   if distances is not None and distances.ndim == 4
                   else PuzzleType.type1)
    solver = PaikinTalSolver(1, pieces, distance_fn, puzzle_type, 0,
                             fixed_puzzle_dimensions, distances=distances)
    solver.run()
    paikin_tal_results, _ = solver.get_solved_puzzles()
    puzzle_pieces = paikin_tal_results[0]
    puzzle_id = puzzle_pieces[0].puzzle_id
    puzzle = Puzzle.reconstruct_from_pieces(puzzle_pieces, piece_width, puzzle_id)
    puzzle.best_buddy_pairs = solver.engine.best_buddy_pairs()
    return puzzle


def _bb_pairs_from_table(bb: np.ndarray, n: int, type2: bool):
    """Flat native best-buddy table -> (i, side, j, j_side) tuples."""
    from .piece import PuzzlePieceSide

    pairs = []
    for s in range(4):
        side = PuzzlePieceSide(s)
        for i in range(n):
            flat = int(bb[s * n + i])
            if flat < 0:
                continue
            if type2:
                pairs.append((i, side, flat % n, PuzzlePieceSide(flat // n)))
            else:
                pairs.append((i, side, flat, side.complementary_side))
    return pairs


def _native_driver(pieces, piece_width, distances, fixed_puzzle_dimensions):
    from vit_ed_tpu import native
    from .piece import PuzzlePieceRotation

    for i, piece in enumerate(pieces):
        piece.id_number = i
    if distances.ndim == 4:
        rows, cols, pids, rots, bb = native.pt_solve2(
            distances, fixed_puzzle_dimensions, numb_puzzles=1,
            new_board_mutual_compatibility=0.0)
    else:
        rows, cols, pids, bb = native.pt_solve(
            distances, fixed_puzzle_dimensions, numb_puzzles=1,
            new_board_mutual_compatibility=0.0)
        rots = np.zeros(len(pieces), np.int32)
    placed = []
    for i, piece in enumerate(pieces):
        if pids[i] < 0:
            continue
        piece.puzzle_id = int(pids[i])
        piece.location = (int(rows[i]), int(cols[i]))
        piece.rotation = PuzzlePieceRotation(int(rots[i]) * 90)
        placed.append(piece)
    puzzle_id = placed[0].puzzle_id
    puzzle = Puzzle.reconstruct_from_pieces(placed, piece_width, puzzle_id)
    puzzle.best_buddy_pairs = _bb_pairs_from_table(bb, len(pieces),
                                                   distances.ndim == 4)
    return puzzle
