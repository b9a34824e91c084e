"""Classical-distance solver demo / driver entry point
(re-creates /root/reference/solver_driver.py): solve puzzles from
``images/*.jpg`` with the classical border-extrapolation distance (no NN),
using the vectorized all-pairs distance computation."""

import glob
import os.path
import random

from vit_ed_tpu.solver.distance import classical_distance_matrix
from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.importer import (
    Puzzle,
    PuzzleResultsCollection,
    PuzzleSolver,
    PuzzleType,
)

if __name__ == "__main__":
    images = glob.glob(os.path.join(os.path.dirname(__file__), "images", "*.jpg"))
    piece_width = 64

    for img_path in images:
        puzzle = Puzzle(0, img_path, piece_width, starting_piece_id=0, erosion=0.07)
        pieces = puzzle.pieces
        random.shuffle(pieces)

        distances = classical_distance_matrix(pieces)
        new_puzzle = paikin_tal_driver(pieces, piece_width, None,
                                       puzzle.grid_size, distances=distances)

        results_information = PuzzleResultsCollection(
            PuzzleSolver.PaikinTal, PuzzleType.type1,
            [new_puzzle.pieces], [img_path])
        results_information.calculate_accuracies([new_puzzle])
        result, perfect = results_information.collect_results()
        print(img_path, {k: v for k, v in result.items()}, "perfect:", sum(perfect))

        output_dir = os.path.join("output", "reconstructed")
        os.makedirs(output_dir, exist_ok=True)
        new_puzzle.save_to_file(os.path.join(output_dir, os.path.basename(img_path)))
