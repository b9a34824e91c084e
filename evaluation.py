"""Cho/McGill/BGU puzzle-reconstruction benchmark
(re-creates /root/reference/evaluation.py with TPU-native pair scoring).

Per image: build the eroded-piece puzzle, score all ordered piece pairs on
device (encoder + stream-2 embedding once per piece, cross-decoder per
pair), route the 4-bin sigmoid scores into the solver distance tensor, run
the Paikin-Tal solver, save the reconstruction, aggregate accuracies.
"""

import argparse
import datetime
import glob
import json
import os
import random
import time

import numpy as np

from vit_ed_tpu.config import get_config
from vit_ed_tpu.data.pieces import PiecesImages
from vit_ed_tpu.data.transforms import TwoImgSyncEval
from vit_ed_tpu.models import build_model
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
from vit_ed_tpu.train import checkpoint as ckpt
from vit_ed_tpu.utils import create_logger, set_seed


def parse_option():
    parser = argparse.ArgumentParser("Pajigsaw testing script", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--pretrained", required=True)
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    args, unparsed = parser.parse_known_args()
    config = get_config(args)
    return args, config


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def testing(config, model, params, logger):
    import jax

    mesh = create_mesh(config.TPU.MESH_SHAPE or None)
    scorer = PairwiseScorer(model, params, mesh, num_outputs=config.MODEL.NUM_CLASSES,
                            pair_chunk=config.DATA.BATCH_SIZE * mesh.devices.size,
                            int8=config.TPU.INT8_SCORE)
    transform = TwoImgSyncEval(config.DATA.IMG_SIZE)

    for subset in ["Cho", "McGill", "BGU"]:
        images = glob.glob(os.path.join(config.DATA.DATA_PATH, subset, "*.jpg"))
        images += glob.glob(os.path.join(config.DATA.DATA_PATH, subset, "*.png"))

        puzzles = []
        for idx, img_path in enumerate(images):
            puzzle = Puzzle(idx, img_path, config.DATA.IMG_SIZE, starting_piece_id=0,
                            erosion=config.DATA.EROSION_RATIO)
            pieces = puzzle.pieces
            random.shuffle(pieces)

            piece_images = PiecesImages(pieces, transform=transform).all_images()
            logits = scorer.score_dense(piece_images,
                                        batch_size=config.DATA.BATCH_SIZE)
            preds = sigmoid(logits)        # [N, N, 4]
            distances = distance_matrix_from_predictions(preds)

            new_puzzle = paikin_tal_driver(pieces, config.DATA.IMG_SIZE, None,
                                           puzzle.grid_size, distances=distances)
            puzzles.append(new_puzzle)

            output_dir = os.path.join("output", "reconstructed", subset)
            os.makedirs(output_dir, exist_ok=True)
            new_puzzle.save_to_file(os.path.join(output_dir, os.path.basename(img_path)))

        if not puzzles:
            logger.info(f"Subset: {subset} — no images found, skipping")
            continue

        print(f"Subset: {subset} {len(puzzles[0].pieces)}")
        results_information = PuzzleResultsCollection(
            PuzzleSolver.PaikinTal, PuzzleType.type1,
            [x.pieces for x in puzzles], images)
        results_information.calculate_accuracies(puzzles)
        result, perfect_puzzles = results_information.collect_results()

        # per-piece result-colored reconstructions (reference color table,
        # puzzle_importer.py:1151-1159)
        output_dir = os.path.join("output", "reconstructed", subset)
        for res, puzzle, img_path in zip(results_information.results, puzzles,
                                         images):
            if res.standard_direct_accuracy is not None:
                puzzle.build_direct_accuracy_image(
                    res.standard_direct_accuracy,
                    os.path.join(output_dir,
                                 "accuracy_" + os.path.basename(img_path)))

        out = "Average_Results:\t"
        for key in result:
            out += f"{key}: {round(sum(result[key]) / len(result[key]), 4)}\t"
        out += f"Perfect: {sum(perfect_puzzles)}"
        logger.info(out)


def main(args, config, logger):
    import jax

    logger.info(f"Creating model:{config.MODEL.TYPE}/{config.MODEL.NAME}")
    model = build_model(config)
    import jax.numpy as jnp

    s = config.DATA.IMG_SIZE
    variables = jax.jit(model.init)(jax.random.PRNGKey(config.SEED),
                                    jnp.zeros((1, 2, s, s, 3)))
    params = variables["params"]
    n_parameters = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"number of params: {n_parameters}")

    if config.MODEL.PRETRAINED and os.path.exists(config.MODEL.PRETRAINED):
        params = ckpt.load_pretrained(config, params, logger)
    else:
        raise Exception(f"Pretrained model does not exist {config.MODEL.PRETRAINED}")

    logger.info("Start testing")
    start_time = time.time()
    testing(config, model, params, logger)
    total_time_str = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f"Test time {total_time_str}")


if __name__ == "__main__":
    args, config = parse_option()
    set_seed(config.SEED)
    os.makedirs(config.OUTPUT, exist_ok=True)
    logger = create_logger(output_dir=config.OUTPUT, dist_rank=0,
                           name=f"{config.MODEL.NAME}", affix="_test")
    logger.info(config.dump())
    logger.info(json.dumps(vars(args)))
    main(args, config, logger)
