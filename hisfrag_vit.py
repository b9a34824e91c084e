"""Embedding ViT baseline on HisFrag
(re-creates /root/reference/hisfrag_vit.py): plain ViT embeddings trained
with batch-wise triplet loss; eval embeds every fragment and scores the
negative-dot-product distance matrix with wi19 metrics. The undeclared
ml_engine losses/distance utilities are implemented natively
(vit_ed_tpu/train/losses.py batch_wise_triplet_loss and the embedding
distance matrix below)."""

import argparse
import time

import numpy as np

from vit_ed_tpu.data.build import build_dataset
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import MPerClassSampler
from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.parallel.mesh import local_batch_size
from vit_ed_tpu.train.engine import Trainer
from vit_ed_tpu.train.losses import batch_wise_triplet_loss
from vit_ed_tpu.utils import AverageMeter

from hisfrag import HisfragTrainer as PairHisfragTrainer


def parse_option():
    parser = argparse.ArgumentParser("HisFrag ViT-embedding script", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--eval-n-items-per-category", type=int, default=5)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--resume", help="resume from checkpoint")
    parser.add_argument("--accumulation-steps", type=int)
    parser.add_argument("--use-checkpoint", action="store_true")
    parser.add_argument("--distance-reduction", type=str, default="min")
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    parser.add_argument("--mode", type=str,
                        choices=["train", "eval", "test", "throughput"], default="train")
    parser.add_argument("--throughput", action="store_true")
    parser.add_argument("--optim", type=str)
    return parser.parse_known_args()


def compute_distance_matrix_from_embeddings(embeddings: np.ndarray,
                                            batch_size: int = 512) -> np.ndarray:
    """Negative dot-product distance matrix (native replacement for
    ml_engine compute_distance_matrix_from_embeddings with
    NegativeLoss(BatchDotProduct), hisfrag_vit.py:157-159)."""
    n = len(embeddings)
    out = np.empty((n, n), np.float32)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        out[lo:hi] = -(embeddings[lo:hi] @ embeddings.T)
    return out


class HisfragVitTrainer(PairHisfragTrainer):
    """Same data plumbing as the pairwise trainer, embedding loss instead."""

    def get_criterion(self):
        return None

    def make_loss_fn(self, criterion):
        def loss_fn(model, params, batch, rng):
            import jax.numpy as jnp

            emb = model.apply({"params": params}, batch["samples"], train=True,
                              rngs={"dropout": rng}).astype(jnp.float32)
            return batch_wise_triplet_loss(emb, batch["targets"], margin=0.5)

        return loss_fn

    def prepare_data(self, samples, targets):
        # uint8 stays uint8 — the u8 device wire (TPU.DEVICE_NORMALIZE)
        # normalizes on device; anything else goes f32 as before
        return {"samples": (samples if samples.dtype == np.uint8
                            else samples.astype(np.float32)),
                "targets": np.asarray(targets, np.int32)}

    def get_dataloader(self, mode):
        if mode in self.data_loader_registers:
            return self.data_loader_registers[mode]
        transforms = self.get_transforms()
        dataset, repeat = build_dataset(mode=mode, config=self.config,
                                        transforms=transforms)
        if mode == "train":
            sampler = MPerClassSampler(dataset.data_labels, m=3,
                                       length_before_new_iter=len(dataset) * repeat,
                                       seed=self.config.SEED + self.rank)
            drop_last = True
        else:
            sampler = None
            drop_last = False
        loader = DataLoader(dataset, sampler=sampler,
                            batch_size=local_batch_size(self.config.DATA.BATCH_SIZE,
                                                        self.mesh),
                            num_workers=self.config.DATA.NUM_WORKERS,
                            drop_last=drop_last)
        self.data_loader_registers[mode] = loader
        return loader

    def validate_dataloader(self, data_loader):
        import jax
        import jax.numpy as jnp

        fwd = jax.jit(lambda p, x: self.model.apply({"params": p}, x))
        params = self.local_params()
        batch_time = AverageMeter()
        end = time.time()
        embeddings, labels = [], []
        for idx, (images, targets) in enumerate(data_loader):
            embs = np.asarray(fwd(params, jnp.asarray(images)), np.float32)
            embeddings.append(embs)
            labels.append(np.asarray(targets))
            batch_time.update(time.time() - end)
            end = time.time()
            if idx % self.config.PRINT_FREQ == 0:
                self.logger.info(f"Eval: [{idx}/{len(data_loader)}]\t"
                                 f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})")
        embeddings = np.concatenate(embeddings)
        labels = np.concatenate(labels)
        self.logger.info(f"N samples: {len(embeddings)}, "
                         f"N categories: {len(np.unique(labels))}")
        distance_matrix = compute_distance_matrix_from_embeddings(
            embeddings, batch_size=self.config.DATA.TEST_BATCH_SIZE)
        return get_metrics(distance_matrix, labels)

    def test(self):
        m_ap, top1, pr_k10, pr_k100 = self.validate_dataloader(
            self.get_dataloader("test"))
        self.logger.info(f"Test results: {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")

    def validate(self):
        m_ap, top1, pr_k10, pr_k100 = self.validate_dataloader(
            self.get_dataloader("val"))
        self.logger.info(f"Validation results: mAP {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")
        return 1 - m_ap


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = HisfragVitTrainer(args)
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "test":
        trainer.test()
    elif args.mode == "throughput":
        trainer.throughput()
    else:
        trainer.train()
