"""HisFrag20 pairwise writer-ID training + sharded O(N^2) retrieval eval
(re-creates /root/reference/hisfrag.py with a TPU-native inner loop).

Training: M-per-class batches; in-batch pair mining builds pos/neg index
pairs from the label-equality matrix with negatives capped at 2x positives
(hisfrag.py:117-155). The encoder runs ONCE per batch; pairs gather encoder
features / decoder tokens inside the jitted loss (fixed-size padded pair
buffer, masked BCE) — the shape-polymorphic pair count of the reference
becomes a static buffer so the step compiles once.

Eval: the sharded pairwise similarity matrix (parallel/pairs.py) replaces
the filesystem-gather loop; wi19 metrics unchanged.
"""

import argparse
import os

import numpy as np

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.data.build import build_dataset
from vit_ed_tpu.data.hisfrag import HisFrag20Test
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import MPerClassSampler
from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.parallel.mesh import local_batch_size
from vit_ed_tpu.parallel.pairs import PairwiseScorer
from vit_ed_tpu.train.engine import Trainer
from vit_ed_tpu.train.losses import bce_with_logits, masked_bce_with_logits
from vit_ed_tpu.utils import list_to_idx


def parse_option():
    parser = argparse.ArgumentParser("HisFrag training and evaluation script",
                                     add_help=False)
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


class HisfragTrainer(Trainer):
    NEG_PAIR_RATIO = 2.0          # hisfrag.py:143
    LOSS_REDUCTION = "mean"       # michigan.py uses "sum"
    NEG_FULL_ROW = False          # michigan.py:142 mines negs over the full row

    def get_criterion(self):
        return bce_with_logits

    # ----------------------------------------------------------- transforms
    def get_transforms(self):
        patch_size = self.config.DATA.IMG_SIZE
        # u8 wire (TPU.DEVICE_NORMALIZE): ship raw pixels, normalize on
        # device — 4x less host->device transfer per batch (the measured
        # dominator of the tunneled single-chip train step,
        # docs/PERFORMANCE.md "u8 device wire")
        dev_norm = self.config.TPU.DEVICE_NORMALIZE

        def train_transform(img):
            img = T.random_affine(img, degrees=5, translate=(0.1, 0.1), fill=0)
            img = T.shift_scale_rotate(img, shift_limit=0.05, scale_limit=0.1,
                                       rotate_limit=10, p=0.5, border_value=(0, 0, 0))
            img = T.random_crop(img, patch_size, pad_if_needed=True)
            img = T.color_jitter(img, 0.3, 0.3, 0.3, 0.3, p=0.5)
            img = T.GaussianBlur(p=0.5, radius_min=1.0, radius_max=2.0)(img)
            if dev_norm:
                return np.asarray(img, np.uint8)
            return T.normalize_image(img)

        # center_crop + normalize with the fused native fast path
        eval_transform = T.OneImgEval(patch_size, crop=True, emit_u8=dev_norm)

        return {"train": train_transform, "val": eval_transform,
                "test": eval_transform}

    def get_dataloader(self, mode):
        if mode in self.data_loader_registers:
            return self.data_loader_registers[mode]
        transforms = self.get_transforms()
        dataset, repeat = build_dataset(mode=mode, config=self.config,
                                        transforms=transforms)
        max_len = len(dataset) * repeat
        sampler = MPerClassSampler(dataset.data_labels, m=3,
                                   length_before_new_iter=max_len,
                                   seed=self.config.SEED + self.rank)
        loader = DataLoader(dataset, sampler=sampler,
                            batch_size=local_batch_size(self.config.DATA.BATCH_SIZE,
                                                        self.mesh),
                            num_workers=self.config.DATA.NUM_WORKERS,
                            drop_last=True)
        self.data_loader_registers[mode] = loader
        return loader

    # ------------------------------------------------------------- training
    @property
    def max_pairs(self):
        if self.config.TPU.MAX_TRAIN_PAIRS:
            return self.config.TPU.MAX_TRAIN_PAIRS
        b = local_batch_size(self.config.DATA.BATCH_SIZE, self.mesh)
        return int((1 + self.NEG_PAIR_RATIO)) * b + self.mesh.devices.size

    def prepare_data(self, samples, targets):
        """Host-side in-batch pair mining (hisfrag.py:117-148), producing a
        fixed-size padded pair buffer."""
        n = samples.shape[0]
        labels = np.asarray(targets)
        pos_mask = labels[:, None] == labels[None, :]
        np.fill_diagonal(pos_mask, False)
        neg_mask = ~(labels[:, None] == labels[None, :])

        pos_groups, neg_groups = [], []
        for i in range(n):
            pos_j = np.flatnonzero(pos_mask[i, i:]) + i
            if len(pos_j):
                pos_groups.append(np.stack([np.full(len(pos_j), i), pos_j], 1))
            if self.NEG_FULL_ROW:
                neg_j = np.flatnonzero(neg_mask[i, :])
            else:
                neg_j = np.flatnonzero(neg_mask[i, i:]) + i
            if len(neg_j):
                neg_groups.append(np.stack([np.full(len(neg_j), i), neg_j], 1))
        pos_groups = np.concatenate(pos_groups, 0) if pos_groups else np.zeros((0, 2), int)
        neg_groups = np.concatenate(neg_groups, 0) if neg_groups else np.zeros((0, 2), int)

        neg_length = min(len(neg_groups), int(self.NEG_PAIR_RATIO * len(pos_groups)))
        perm = np.random.permutation(len(neg_groups))[:neg_length]
        neg_groups = neg_groups[perm]

        groups = np.concatenate([pos_groups, neg_groups], 0)
        pair_targets = np.concatenate([np.ones(len(pos_groups), np.float32),
                                       np.zeros(len(neg_groups), np.float32)])

        m = self.max_pairs
        if len(groups) > m:
            keep = np.random.permutation(len(groups))[:m]
            groups, pair_targets = groups[keep], pair_targets[keep]
        pad = m - len(groups)
        mask = np.concatenate([np.ones(len(groups), np.float32),
                               np.zeros(pad, np.float32)])
        groups = np.concatenate([groups, np.zeros((pad, 2), groups.dtype)], 0)
        pair_targets = np.concatenate([pair_targets, np.zeros(pad, np.float32)])

        return {
            # uint8 stays uint8 — the u8 device wire (TPU.DEVICE_NORMALIZE)
            # normalizes on device; anything else goes f32 as before
            "samples": (samples if samples.dtype == np.uint8
                        else samples.astype(np.float32)),
            "gi": groups[:, 0].astype(np.int32),   # decoder-input image index
            "gj": groups[:, 1].astype(np.int32),   # encoder-context index
            "pair_targets": pair_targets[:, None],
            "pair_mask": mask,
            "targets": labels.astype(np.int32),
        }

    def make_loss_fn(self, criterion):
        reduction = self.LOSS_REDUCTION
        moe = self.config.MODEL.PJS.MOE
        is_moe = self.config.MODEL.TYPE == "pjs" and moe.EXPERTS > 0
        aux_w = moe.AUX_WEIGHT if is_moe else 0.0
        z_w = moe.Z_WEIGHT if is_moe else 0.0

        def loss_fn(model, params, batch, rng):
            import jax
            import jax.numpy as jnp

            rngs = {"dropout": rng}
            samples = batch["samples"]
            aux = 0.0
            if aux_w:
                from vit_ed_tpu.models.moe import collect_moe_aux

                # the expert banks live in the encoder: collect their
                # load-balance + z terms on the forward_first_part apply
                feats, mut = model.apply({"params": params}, samples,
                                         train=True, forward_first_part=True,
                                         rngs=rngs, mutable=["moe_aux"])
                aux = collect_moe_aux(mut, aux_w, z_w)
            else:
                feats = model.apply({"params": params}, samples, train=True,
                                    forward_first_part=True, rngs=rngs)
            tokens = model.apply({"params": params}, samples, train=True,
                                 method=model.prepare_x2, rngs=rngs)
            f = feats[batch["gj"]]
            t = tokens[batch["gi"]]
            logits = model.apply({"params": params}, f, t, train=True,
                                 method=model.score_tokens, rngs=rngs)

            return masked_bce_with_logits(logits.astype(jnp.float32),
                                          batch["pair_targets"],
                                          batch["pair_mask"],
                                          reduction=reduction) + aux

        return loss_fn

    # ----------------------------------------------------------------- eval
    def validate_dataloader(self, split, remove_cache_file=False):
        transform = self.get_transforms()[split.value]
        dataset = HisFrag20Test(
            self.config.DATA.DATA_PATH, split, transform=transform,
            val_n_items_per_writer=self.config.DATA.EVAL_N_ITEMS_PER_CATEGORY)

        if remove_cache_file:
            import glob

            for f in glob.glob(os.path.join(self.config.OUTPUT,
                                            f"{split.value}_rank*.npz")):
                os.unlink(f)

        scorer = PairwiseScorer(self.model, self.params, self.mesh, num_outputs=1,
                                pair_chunk=self.config.DATA.TEST_BATCH_SIZE
                                * self.mesh.devices.size,
                                int8=self.config.TPU.INT8_SCORE)
        sim = scorer.score_dataset(
            dataset, batch_size=self.config.DATA.BATCH_SIZE, logger=self.logger,
            out_dir=self.config.OUTPUT, tag=split.value, rank=self.rank,
            world_size=self.world_size, num_workers=self.config.DATA.NUM_WORKERS)

        distance_matrix = (1.0 - sim.astype(np.float32)).astype(np.float16)
        labels = [os.path.splitext(os.path.basename(s))[0] for s in dataset.samples]
        self.logger.info("Distance matrix is generated!")
        return distance_matrix, labels

    def test(self):
        if self.config.TPU.SHARDED_EVAL_METRICS:
            return self._test_sharded()
        if self.config.TPU.EVAL_SLAB_ON_DISK:
            self.logger.warning(
                "TPU.EVAL_SLAB_ON_DISK has no effect without "
                "TPU.SHARDED_EVAL_METRICS (the assembled test path "
                "builds the N x N matrix)")
        distance_matrix, img_names = self.validate_dataloader(HisFrag20Test.Split.TEST)
        labels = list_to_idx(img_names, lambda x: x.split("_")[0])
        m_ap, top1, pr_k10, pr_k100 = get_metrics(distance_matrix.astype(np.float32),
                                                  np.asarray(labels))
        self.logger.info(f"mAP {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")
        if self.rank == 0:
            import pandas as pd

            df = pd.DataFrame(data=distance_matrix, columns=img_names, index=img_names)
            result_file = os.path.join(self.config.OUTPUT,
                                       f"distance_matrix_rank{self.rank}.csv")
            df.to_csv(result_file, index=True)

    def _test_sharded(self):
        """TPU.SHARDED_EVAL_METRICS: the similarity matrix is never
        assembled — each process keeps its complete row slab and the wi19
        metrics merge from per-row partial sums (O(N^2/world) host memory;
        for N well past HisFrag20's 20k). Same numbers as test(), asserted
        in tests/test_metrics_sharded.py and tests/test_multiprocess.py."""
        from jax.experimental.multihost_utils import process_allgather

        from vit_ed_tpu.metrics.wi19_sharded import merge_partials, row_partials

        split = HisFrag20Test.Split.TEST
        transform = self.get_transforms()[split.value]
        dataset = HisFrag20Test(
            self.config.DATA.DATA_PATH, split, transform=transform,
            val_n_items_per_writer=self.config.DATA.EVAL_N_ITEMS_PER_CATEGORY)
        scorer = PairwiseScorer(self.model, self.params, self.mesh, num_outputs=1,
                                pair_chunk=self.config.DATA.TEST_BATCH_SIZE
                                * self.mesh.devices.size,
                                int8=self.config.TPU.INT8_SCORE)
        rows, row_range = scorer.score_dataset(
            dataset, batch_size=self.config.DATA.BATCH_SIZE, logger=self.logger,
            out_dir=self.config.OUTPUT, tag=split.value, rank=self.rank,
            world_size=self.world_size, num_workers=self.config.DATA.NUM_WORKERS,
            assemble=False, slab_on_disk=self.config.TPU.EVAL_SLAB_ON_DISK)
        img_names = [os.path.splitext(os.path.basename(s))[0]
                     for s in dataset.samples]
        labels = np.asarray(list_to_idx(img_names, lambda x: x.split("_")[0]))
        # consume the slab in row blocks (partials are pure sums, so
        # block partials merge exactly) — host RAM stays O(block x N) even
        # when the slab is an EVAL_SLAB_ON_DISK memmap; the dtype chain
        # matches the assembled test() path per element (distance rounded
        # to float16), so both paths rank ties identically
        blocks = []
        for a in range(0, rows.shape[0], 2048):
            dist = (1.0 - rows[a:a + 2048].astype(np.float32)
                    ).astype(np.float16)
            blocks.append(row_partials(
                dist.astype(np.float32), labels,
                row_labels=labels[row_range.start + a:
                                  row_range.start + a + dist.shape[0]]))
        part = {k: sum(b[k] for b in blocks) for k in blocks[0]}
        keys = sorted(part)
        if self.world_size > 1:
            stacked = np.asarray(process_allgather(
                np.asarray([part[k] for k in keys], np.float64)))
            parts = [dict(zip(keys, row)) for row in stacked]
        else:
            parts = [part]
        m_ap, top1, pr_k10, pr_k100 = merge_partials(parts)
        self.logger.info(f"mAP {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")
        return m_ap

    def validate(self):
        distance_matrix, img_names = self.validate_dataloader(
            HisFrag20Test.Split.VAL, remove_cache_file=True)
        labels = list_to_idx(img_names, lambda x: x.split("_")[0])
        m_ap, top1, pr_k10, pr_k100 = get_metrics(distance_matrix.astype(np.float32),
                                                  np.asarray(labels))
        self.logger.info(f"mAP {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")
        return 1 - m_ap


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = HisfragTrainer(args)
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "test":
        trainer.test()
    elif args.mode == "throughput":
        trainer.throughput()
    else:
        trainer.train()
