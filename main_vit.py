"""Triplet-ViT puzzle baseline entry point
(re-creates /root/reference/main_vit.py): plain ViT embeddings trained
with cosine-distance triplet loss on rotated DIV2K patch triplets; testing
scores piece pairs by per-rotation embedding distances and drives the
Paikin-Tal solver."""

import argparse
import datetime
import glob
import os
import random
import time

import numpy as np

from vit_ed_tpu.data.pieces import PiecesDatasetTriplet
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.transforms import TwoImgSyncEval
from vit_ed_tpu.solver.driver import paikin_tal_driver
from vit_ed_tpu.solver.importer import (
    Puzzle,
    PuzzleResultsCollection,
    PuzzleSolver,
    PuzzleType,
)
from vit_ed_tpu.train.engine import Trainer
from vit_ed_tpu.train.losses import triplet_cosine_loss
from vit_ed_tpu.utils import AverageMeter


def parse_option():
    parser = argparse.ArgumentParser("ViT-triplet training and evaluation script",
                                     add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--puzzle-data-path", type=str)
    parser.add_argument("--pretrained")
    parser.add_argument("--resume", help="resume from checkpoint")
    parser.add_argument("--accumulation-steps", type=int)
    parser.add_argument("--use-checkpoint", action="store_true")
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    parser.add_argument("--mode", type=str,
                        choices=["train", "eval", "throughput", "test"], default="train")
    parser.add_argument("--optim", type=str)
    return parser.parse_known_args()


def cosine_distance_np(x, y):
    xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    yn = y / np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return 1.0 - np.sum(xn * yn, axis=-1)


class VitTripletTrainer(Trainer):
    """main_vit.py:68-137: batch [B, 4, 3, H, W, C] directional triplets."""

    def get_criterion(self):
        return None

    def make_loss_fn(self, criterion):
        def loss_fn(model, params, batch, rng):
            import jax.numpy as jnp

            samples = batch["samples"]          # [B, X=4, S=3, H, W, C]
            b, x_, s_, h, w, c = samples.shape
            flat = samples.reshape(b * x_ * s_, h, w, c)
            emb = model.apply({"params": params}, flat, train=True,
                              rngs={"dropout": rng})
            emb = emb.reshape(b * x_, s_, -1).astype(jnp.float32)
            return triplet_cosine_loss(emb[:, 0], emb[:, 1], emb[:, 2], margin=0.2)

        return loss_fn

    def validate(self):
        import jax
        import jax.numpy as jnp

        data_loader = self.get_dataloader("validation")
        batch_time = AverageMeter()
        loss_meter = AverageMeter()

        def eval_loss(params, samples):
            b, x_, s_, h, w, c = samples.shape
            emb = self.model.apply({"params": params},
                                   samples.reshape(b * x_ * s_, h, w, c))
            emb = emb.reshape(b * x_, s_, -1).astype(jnp.float32)
            return triplet_cosine_loss(emb[:, 0], emb[:, 1], emb[:, 2], margin=0.2)

        jloss = jax.jit(eval_loss)
        start = time.time()
        end = time.time()
        for idx, (images, _targets) in enumerate(data_loader):
            loss = float(np.asarray(jloss(self.params, jnp.asarray(images))))
            loss_meter.update(loss, images.shape[0])
            batch_time.update(time.time() - end)
            end = time.time()
            if idx % self.config.PRINT_FREQ == 0:
                self.logger.info(f"Eval: [{idx}/{len(data_loader)}]\t"
                                 f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                                 f"Loss {loss_meter.val:.4f} ({loss_meter.avg:.4f})")
        loss_meter.all_reduce()
        test_time = datetime.timedelta(seconds=int(time.time() - start))
        self.logger.info(f"Overall: Time {test_time}\tLoss {loss_meter.avg:.4f}")
        return loss_meter.avg

    def testing(self):
        """main_vit.py:139-225: embedding distances per rotation-pairing
        drive the solver."""
        import jax
        import jax.numpy as jnp

        config = self.config
        emb_fn = jax.jit(lambda p, x: self.model.apply({"params": p}, x))
        params = self.local_params()

        for subset in ["Cho", "McGill", "BGU"]:
            images = glob.glob(os.path.join(config.DATA.DATA_PATH, subset, "*.jpg"))
            images += glob.glob(os.path.join(config.DATA.DATA_PATH, subset, "*.png"))

            puzzles = []
            for idx, img_path in enumerate(images):
                puzzle = Puzzle(idx, img_path, config.DATA.IMG_SIZE, starting_piece_id=0,
                                erosion=config.DATA.EROSION_RATIO)
                pieces = puzzle.pieces
                random.shuffle(pieces)
                dataset = PiecesDatasetTriplet(
                    pieces, transform=TwoImgSyncEval(config.DATA.IMG_SIZE))
                loader = DataLoader(dataset, batch_size=config.DATA.BATCH_SIZE,
                                    num_workers=config.DATA.NUM_WORKERS)

                distance_map = {}
                for batch_images, targets in loader:
                    b, s, h, w, c = batch_images.shape   # s = 8 (4 pairings x 2)
                    emb = np.asarray(emb_fn(params,
                                            jnp.asarray(batch_images.reshape(
                                                b * s, h, w, c))), np.float32)
                    emb = emb.reshape(b, s // 2, 2, -1)
                    dists = cosine_distance_np(emb[:, :, 0, :], emb[:, :, 1, :])
                    for pred, entry_id in zip(dists, np.asarray(targets)):
                        i, j = dataset.entries[int(entry_id)]
                        piece_i = pieces[i].origin_piece_id
                        piece_j = pieces[j].origin_piece_id
                        distance_map.setdefault(piece_i, {})[piece_j] = pred

                # route per-pairing distances into the [4, N, N] tensor:
                # pairings were built as (right, bottom, left, top) of first
                n = len(pieces)
                D = np.full((4, n, n), np.inf)
                origin_to_pos = {p.origin_piece_id: k for k, p in enumerate(pieces)}
                from vit_ed_tpu.solver.distance import BOTTOM, LEFT, RIGHT, TOP

                side_order = [RIGHT, BOTTOM, LEFT, TOP]
                for oi, row in distance_map.items():
                    for oj, pred in row.items():
                        i_, j_ = origin_to_pos[oi], origin_to_pos[oj]
                        for k, s_idx in enumerate(side_order):
                            D[s_idx, i_, j_] = pred[k] * 1000.0

                new_puzzle = paikin_tal_driver(pieces, config.DATA.IMG_SIZE, None,
                                               puzzle.grid_size, distances=D)
                puzzles.append(new_puzzle)

                output_dir = os.path.join("output", "reconstructed", subset)
                os.makedirs(output_dir, exist_ok=True)
                new_puzzle.save_to_file(os.path.join(output_dir,
                                                     os.path.basename(img_path)))

            if not puzzles:
                continue
            print(f"Subset: {subset} {len(puzzles[0].pieces)}")
            results = PuzzleResultsCollection(PuzzleSolver.PaikinTal, PuzzleType.type1,
                                              [x.pieces for x in puzzles], images)
            results.calculate_accuracies(puzzles)
            result, perfect_puzzles = results.collect_results()
            out = "Average_Results:\t"
            for key in result:
                out += f"{key}: {round(sum(result[key]) / len(result[key]), 4)}\t"
            out += f"Perfect: {sum(perfect_puzzles)}"
            self.logger.info(out)


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = VitTripletTrainer(args)
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "throughput":
        trainer.throughput()
    elif args.mode == "test":
        trainer.testing()
    else:
        trainer.train()
