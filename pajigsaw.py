"""Pajigsaw-fragment puzzle training/eval entry point
(re-creates /root/reference/pajigsaw.py): trains the 4-bin compatibility
model on Pajigsaw pairs; validation solves each held-out puzzle from
device-scored piece pairs and reports neighbor accuracy."""

import argparse
import os
import random
import time

import numpy as np

from vit_ed_tpu.data.pajigsaw import Pajigsaw, PajigsawPieces
from vit_ed_tpu.data.pieces import PiecesImages
from vit_ed_tpu.data.transforms import TwoImgSyncEval
from vit_ed_tpu.parallel.pairs import PairwiseScorer
from vit_ed_tpu.solver.distance import distance_matrix_from_predictions
from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.importer import (
    PuzzleResultsCollection,
    PuzzleSolver,
    PuzzleType,
)
from vit_ed_tpu.train.engine import Trainer
from vit_ed_tpu.train.losses import bce_with_logits
from vit_ed_tpu.utils import AverageMeter


def parse_option():
    parser = argparse.ArgumentParser("Pajigsaw training and evaluation script",
                                     add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--resume", help="resume from checkpoint")
    parser.add_argument("--accumulation-steps", type=int)
    parser.add_argument("--use-checkpoint", action="store_true")
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    parser.add_argument("--mode", type=str,
                        choices=["train", "eval", "test", "throughput"], default="train")
    parser.add_argument("--throughput", action="store_true")
    parser.add_argument("--optim", type=str)
    return parser.parse_known_args()


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class PajigsawTrainer(Trainer):

    def get_criterion(self):
        return bce_with_logits

    def validate_dataloader(self, dataset):
        scorer = PairwiseScorer(self.model, self.params, self.mesh,
                                num_outputs=self.config.MODEL.NUM_CLASSES,
                                pair_chunk=self.config.DATA.BATCH_SIZE
                                * self.mesh.devices.size,
                                int8=self.config.TPU.INT8_SCORE)
        transform = TwoImgSyncEval(self.config.DATA.IMG_SIZE)

        puzzles, im_names = [], []
        batch_time = AverageMeter()
        end = time.time()
        for idx in range(len(dataset)):
            pieces, im_name, grid_size = dataset[idx]
            random.shuffle(pieces)
            im_names.append(im_name)

            piece_images = PiecesImages(pieces, transform=transform).all_images()
            logits = scorer.score_dense(piece_images,
                                        batch_size=self.config.DATA.BATCH_SIZE)
            preds = sigmoid(logits)
            distances = distance_matrix_from_predictions(preds)
            new_puzzle = paikin_tal_driver(pieces, self.config.DATA.IMG_SIZE, None,
                                           grid_size, distances=distances)
            puzzles.append(new_puzzle)

            batch_time.update(time.time() - end)
            end = time.time()
            if idx % self.config.PRINT_FREQ == 0:
                self.logger.info(f"Eval: [{idx}/{len(dataset)}]\t"
                                 f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})")

        results_information = PuzzleResultsCollection(
            PuzzleSolver.PaikinTal, PuzzleType.type1,
            [x.pieces for x in puzzles], im_names)
        results_information.calculate_accuracies(puzzles)
        result, perfect_puzzles = results_information.collect_results()

        out = "Average_Results:\t"
        for key in result:
            out += f"{key}: {round(sum(result[key]) / len(result[key]), 4)}\t"
        out += f"Perfect: {sum(perfect_puzzles)}"
        self.logger.info(out)
        return sum(result["neighbor"]) / len(result["neighbor"]), puzzles, im_names

    def test(self):
        self.logger.info("Starting test...")
        dataset = PajigsawPieces(self.config.DATA.DATA_PATH, Pajigsaw.Split.TEST)
        _, puzzles, im_names = self.validate_dataloader(dataset)
        for puzzle, im_name in zip(puzzles, im_names):
            output_file = os.path.join(self.config.OUTPUT, "reconstructed",
                                       f"{im_name}.jpg")
            os.makedirs(os.path.dirname(output_file), exist_ok=True)
            puzzle.save_to_file(output_file)

    def validate(self):
        self.logger.info("Starting validation...")
        dataset = PajigsawPieces(self.config.DATA.DATA_PATH, Pajigsaw.Split.VAL)
        neighbor_precision, _, _ = self.validate_dataloader(dataset)
        return 1 - neighbor_precision


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = PajigsawTrainer(args)
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "test":
        trainer.test()
    elif args.mode == "throughput":
        trainer.throughput()
    else:
        trainer.train()
