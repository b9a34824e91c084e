"""End-to-end puzzle evaluation slice (SURVEY.md §7 step 4): image ->
eroded pieces -> device-scored pair predictions -> solver -> accuracies."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vit_ed_tpu.data.pieces import PiecesImages
from vit_ed_tpu.data.transforms import TwoImgSyncEval
from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.parallel.mesh import create_mesh
from vit_ed_tpu.parallel.pairs import PairwiseScorer
from vit_ed_tpu.solver.distance import distance_matrix_from_predictions
from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.importer import (
    Puzzle,
    PuzzleResultsCollection,
    PuzzleSolver,
    PuzzleType,
)


def test_puzzle_eval_pipeline(tmp_path):
    # synthetic 3x3-piece image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    img_path = str(tmp_path / "puzzle.png")
    Image.fromarray(img).save(img_path)

    puzzle = Puzzle(0, img_path, 32, starting_piece_id=0, erosion=0.07)
    assert puzzle.grid_size == (3, 3)
    assert len(puzzle.pieces) == 9
    # erosion: ceil(32 * 0.93) = 30
    assert puzzle.pieces[0].width == 30

    pieces = list(puzzle.pieces)
    random.shuffle(pieces)

    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))

    mesh = create_mesh()
    scorer = PairwiseScorer(model, variables["params"], mesh, num_outputs=4,
                            pair_chunk=32)
    piece_images = PiecesImages(pieces, transform=TwoImgSyncEval(32)).all_images()
    logits = scorer.score_dense(piece_images, batch_size=8)
    assert logits.shape == (9, 9, 4)

    preds = 1.0 / (1.0 + np.exp(-logits))
    distances = distance_matrix_from_predictions(preds)
    new_puzzle = paikin_tal_driver(pieces, 32, None, puzzle.grid_size,
                                   distances=distances)

    results = PuzzleResultsCollection(PuzzleSolver.PaikinTal, PuzzleType.type1,
                                      [new_puzzle.pieces], [img_path])
    results.calculate_accuracies([new_puzzle])
    result, perfect = results.collect_results()
    # untrained model: accuracies are arbitrary but well-formed
    for key in ("Direct_Standard", "Direct_Modified", "neighbor"):
        assert 0.0 <= result[key][0] <= 1.0
    # reconstruction image has the right canvas size
    out_path = str(tmp_path / "recon.png")
    new_puzzle.save_to_file(out_path)
    assert os.path.exists(out_path)


def test_native_and_python_driver_agree(tmp_path):
    """The driver's native C++ path and the Python solver must place pieces
    identically for NN-predicted distances."""
    from vit_ed_tpu import native

    if not native.is_available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    img_path = str(tmp_path / "p.png")
    Image.fromarray(img).save(img_path)
    puzzle = Puzzle(0, img_path, 32, erosion=0.07)
    pieces = list(puzzle.pieces)
    random.Random(2).shuffle(pieces)

    preds = rng.uniform(size=(9, 9, 4))
    D = distance_matrix_from_predictions(preds)

    import copy

    p_native = paikin_tal_driver(copy.deepcopy(pieces), 32, None,
                                 puzzle.grid_size, distances=D.copy(),
                                 use_native=True)
    p_python = paikin_tal_driver(copy.deepcopy(pieces), 32, None,
                                 puzzle.grid_size, distances=D.copy(),
                                 use_native=False)
    loc_n = sorted((p.original_piece_id, p.location) for p in p_native.pieces)
    loc_p = sorted((p.original_piece_id, p.location) for p in p_python.pieces)
    assert loc_n == loc_p


def test_best_buddy_accuracy_and_color_image(tmp_path):
    """BestBuddyAccuracy (puzzle_importer.py:1630+) + color-coded
    direct-accuracy rendering on a classically-solved smooth puzzle."""
    y = np.linspace(10, 120, 96)[:, None, None]
    x = np.linspace(0, 80, 96)[None, :, None]
    c = np.arange(3)[None, None, :] * 12.0
    img = (y + 0.7 * x + c + 8 * np.sin(y / 17) * np.cos(x / 23)).astype(np.uint8)
    img_path = str(tmp_path / "smooth.png")
    Image.fromarray(img[..., ::-1]).save(img_path)  # BGR->RGB for PIL

    from vit_ed_tpu.solver.piece import PuzzlePiece

    puzzle = Puzzle(0, img_path, 32, starting_piece_id=0, erosion=0)
    pieces = list(puzzle.pieces)
    random.shuffle(pieces)
    new_puzzle = paikin_tal_driver(pieces, 32,
                                   PuzzlePiece.calculate_asymmetric_distance,
                                   puzzle.grid_size)
    assert new_puzzle.best_buddy_pairs  # driver attaches engine BBs

    results = PuzzleResultsCollection(PuzzleSolver.PaikinTal, PuzzleType.type1,
                                      [new_puzzle.pieces], [img_path])
    results.calculate_accuracies([new_puzzle])
    result, perfect = results.collect_results()
    assert "best_buddy" in result
    # a clean smooth puzzle: every best buddy is a true neighbor
    assert result["best_buddy"][0] == 1.0
    bb_acc = results.results[0].best_buddy_accuracy
    assert bb_acc.numb_wrong_best_buddies == 0
    assert bb_acc.numb_correct_best_buddies == bb_acc.total_best_buddies
    # interior piece has BBs on all 4 sides: 3x3 grid -> 2*2*3 + ... >= 12
    assert bb_acc.total_best_buddies == 24  # 12 adjacent pairs, both directions

    # color-coded direct-accuracy image
    acc_img_path = str(tmp_path / "acc.png")
    acc_img = new_puzzle.build_direct_accuracy_image(
        results.results[0].standard_direct_accuracy, acc_img_path)
    assert os.path.exists(acc_img_path)
    assert acc_img.shape == (96, 96, 3)
    # perfect solve -> green borders present
    green = np.array([0, 204, 0])
    assert (np.all(acc_img == green, axis=-1)).any()
