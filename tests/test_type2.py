"""Type-2 (rotation-aware) puzzle solving.

Covers the reference's type-2 pairing surface: all-16 side-pair distances
with the border reversal rule (puzzle_piece.py:534-609), joint (piece, side)
min/second/best-buddy semantics (inter_piece_distance.py:189-369), and
rotated placement (solver.py:456-499, puzzle_piece.py:611-717).
"""

import numpy as np
import pytest

from vit_ed_tpu.solver.distance import (
    CompatibilityEngine2,
    classical_distance_matrix_type2,
    distance_matrix_from_function_type2,
)
from vit_ed_tpu.solver.importer import PuzzleType
from vit_ed_tpu.solver.piece import (
    PuzzlePiece,
    PuzzlePieceRotation,
    PuzzlePieceSide,
)
from vit_ed_tpu.solver.solver import PaikinTalSolver


def _grid_image(rows, cols, w, seed=0):
    """Asymmetric smooth image: unique, orientation-distinguishable borders."""
    rng = np.random.default_rng(seed)
    y = np.linspace(10, 120, rows * w)[:, None, None]
    x = np.linspace(0, 80, cols * w)[None, :, None]
    c = np.arange(3)[None, None, :] * 12.0
    img = y + 0.7 * x + c + 8.0 * np.sin(y / 17.0 + 2.0 * c) * np.cos(x / 23.0)
    img += rng.normal(0, 1.0, img.shape)
    assert img.min() > 0 and img.max() < 255  # saturation would alias borders
    return img.astype(np.uint8)


def _make_pieces(img, w, rotations=None):
    rows, cols = img.shape[0] // w, img.shape[1] // w
    pieces = []
    for r in range(rows):
        for c in range(cols):
            patch = img[r * w:(r + 1) * w, c * w:(c + 1) * w].copy()
            k = 0 if rotations is None else rotations[r * cols + c]
            if k:
                patch = np.rot90(patch, k).copy()
            pieces.append(PuzzlePiece(0, (r, c), patch,
                                      piece_id=r * cols + c,
                                      puzzle_grid_size=(rows, cols)))
    return pieces


def test_classical_type2_matches_reference_function():
    img = _grid_image(2, 3, 8)
    pieces = _make_pieces(img, 8)
    fast = classical_distance_matrix_type2(pieces)
    slow = distance_matrix_from_function_type2(
        pieces, PuzzlePiece.calculate_asymmetric_distance)
    n = len(pieces)
    off_diag = ~np.eye(n, dtype=bool)
    for s in range(4):
        for t in range(4):
            np.testing.assert_allclose(fast[s][:, t][off_diag],
                                       slow[s][:, t][off_diag])


def test_engine2_min_second_and_best_buddies():
    img = _grid_image(3, 3, 8)
    pieces = _make_pieces(img, 8)
    D = classical_distance_matrix_type2(pieces)
    eng = CompatibilityEngine2(D)
    n = len(pieces)

    # min/second over the joint (side, piece) space
    flat = D.reshape(4, n, 4 * n).copy()
    idx = np.arange(n)
    for t in range(4):
        flat[:, idx, t * n + idx] = np.inf
    srt = np.sort(flat, axis=2)
    np.testing.assert_allclose(eng.min_d, srt[:, :, 0])
    np.testing.assert_allclose(eng.second_d, srt[:, :, 1])

    # best buddies are symmetric: if (t, j) is bb of (s, i) then (s, i) is
    # bb of (t, j)
    for s in range(4):
        for i in range(n):
            for j, t_side in eng.best_buddies(i, PuzzlePieceSide(s)):
                back = eng.best_buddies(j, t_side)
                assert back == [(i, PuzzlePieceSide(s))]

    # interior adjacent pairs of a smooth image should be best buddies at
    # complementary sides (the type-1 relations survive in type-2 space)
    found = eng.best_buddies(4, PuzzlePieceSide.right)  # center piece
    assert found == [(5, PuzzlePieceSide.left)]


def _solve_type2(pieces):
    solver = PaikinTalSolver(1, pieces,
                             PuzzlePiece.calculate_asymmetric_distance,
                             PuzzleType.type2, 0.0)
    solver.run()
    solved, unassigned = solver.get_solved_puzzles()
    assert not unassigned
    return solved[0]


def _adjacency_preserved(placed):
    """Fraction of original adjacent pairs that are adjacent when solved."""
    orig = {p.original_piece_id: np.asarray(p._orig_loc) for p in placed}
    new = {p.original_piece_id: np.asarray(p.location) for p in placed}
    total, kept = 0, 0
    for a in orig:
        for b in orig:
            if a >= b:
                continue
            if np.abs(orig[a] - orig[b]).sum() == 1:
                total += 1
                kept += int(np.abs(new[a] - new[b]).sum() == 1)
    return kept / max(total, 1)


def test_type2_solves_unrotated_puzzle():
    img = _grid_image(3, 4, 8)
    pieces = _make_pieces(img, 8)
    placed = _solve_type2(pieces)
    assert _adjacency_preserved(placed) == 1.0
    rotations = {p.rotation for p in placed}
    assert rotations == {PuzzlePieceRotation.degree_0}


def test_type2_recovers_physical_rotations():
    img = _grid_image(3, 4, 8)
    rng = np.random.default_rng(3)
    ks = rng.integers(0, 4, size=12)
    pieces = _make_pieces(img, 8, rotations=ks)
    placed = _solve_type2(pieces)
    assert _adjacency_preserved(placed) == 1.0
    # solved rotation must undo the scramble up to one global rotation
    combo_a = {(p.rotation.value // 90 + int(ks[p.original_piece_id])) % 4
               for p in placed}
    combo_b = {(p.rotation.value // 90 - int(ks[p.original_piece_id])) % 4
               for p in placed}
    assert len(combo_a) == 1 or len(combo_b) == 1, (combo_a, combo_b)


def test_type2_closed_form_on_puzzle_tester():
    """Hand-derived type-2 distances on the PuzzleTester sequential-pixel
    puzzle (pixel (r,c,ch) = 45r + 3c + ch, 5x5 pieces, 3x3 grid).

    D[right, p0, right, p1] (reversal applies, s==t):
      predicted right of p0: 45r + 15 + ch; reversed right border of p1:
      207 - 45r + ch; per-channel diff |90r - 192| summed over r, ch
      = 3 * (192 + 102 + 12 + 78 + 168) = 1656.
    D[top, p4, right, p1] (reversal applies, both in {top, right}):
      predicted top of p4: 195 + 3i + ch; reversed right border of p1:
      207 - 45i + ch; diff |48i - 12| summed = 3 * 444 = 1332.
    """
    from vit_ed_tpu.solver.importer import PuzzleTester

    puzzle = PuzzleTester.build_dummy_puzzle()
    D = classical_distance_matrix_type2(puzzle.pieces)
    RIGHT, TOP = 1, 0
    assert D[RIGHT, 0, RIGHT, 1] == 1656.0
    assert D[TOP, 4, RIGHT, 1] == 1332.0
    # true type-1 neighbors stay exact-zero in the type-2 tensor
    LEFT = 3
    assert D[RIGHT, 0, LEFT, 1] == 0.0
    assert D[2, 0, TOP, 3] == 0.0  # bottom of p0 against top of p3


def test_type2_rotated_neighbor_zero_distance():
    """Physically rotating a piece moves its perfect-match side to the
    rotated position: p1 rotated 90 deg CCW puts its original LEFT border
    (the exact continuation of p0's right side) on its BOTTOM."""
    from vit_ed_tpu.solver.importer import PuzzleTester

    puzzle = PuzzleTester.build_dummy_puzzle()
    p0, p1 = puzzle.pieces[0], puzzle.pieces[1]
    rot_img = np.rot90(p1.lab_image, 1).copy()
    p1_rot = PuzzlePiece(0, (0, 1), rot_img, piece_id=1,
                         puzzle_grid_size=(3, 3))
    RIGHT, BOTTOM = PuzzlePieceSide.right, PuzzlePieceSide.bottom
    dists = {t: PuzzlePiece.calculate_asymmetric_distance(p0, RIGHT, p1_rot, t)
             for t in PuzzlePieceSide.get_all_sides()}
    assert dists[BOTTOM] == 0
    assert all(v > 0 for t, v in dists.items() if t != BOTTOM)
