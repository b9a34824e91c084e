"""Michigan papyrus training + Geshaem cross-eval entry point
(re-creates /root/reference/michigan.py with the TPU-native inner loop —
same trainer pattern as hisfrag.py but sum-reduction BCE and negatives
capped at 1x positives, michigan.py:65-66, 150)."""

import argparse
import datetime
import os
import statistics
import time

import numpy as np

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.data.build import build_dataset
from vit_ed_tpu.data.geshaem import GeshaemPatch
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.michigan import MichiganTest
from vit_ed_tpu.data.samplers import MPerClassSampler
from vit_ed_tpu.metrics import calc_map_prak, get_metrics
from vit_ed_tpu.parallel.mesh import local_batch_size
from vit_ed_tpu.parallel.pairs import PairwiseScorer
from vit_ed_tpu.utils import AverageMeter

from hisfrag import HisfragTrainer


def parse_option():
    parser = argparse.ArgumentParser("Michigan/Geshaem training and evaluation script",
                                     add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--eval-n-items-per-category", type=int, default=5)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--geshaem-data-path", type=str)
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


class MichiganTrainer(HisfragTrainer):
    NEG_PAIR_RATIO = 1.0       # michigan.py:150
    LOSS_REDUCTION = "sum"     # michigan.py:65-66
    NEG_FULL_ROW = True        # michigan.py:142: negatives over the full row
    geshaem_data_path = None

    def get_transforms(self):
        """michigan.py:68-101 augmentation stack, natively."""
        img_size = self.config.DATA.IMG_SIZE
        # u8 wire (TPU.DEVICE_NORMALIZE): ship raw pixels, normalize on
        # device — same contract as HisfragTrainer.get_transforms
        dev_norm = self.config.TPU.DEVICE_NORMALIZE

        def train_transform(img):
            img = T.random_crop(img, img_size, pad_if_needed=True, fill=255)
            # RandomResizedCrop(scale 0.6-1.0)
            import random as _r

            scale = _r.uniform(0.6, 1.0)
            side = max(int(img_size * scale ** 0.5), 8)
            img = T.random_crop(img, side)
            img = img.resize((img_size, img_size))
            img = _coarse_dropout(img, p=0.9)
            if _r.random() < 0.5:
                from PIL import Image as _I

                img = img.transpose(_I.FLIP_LEFT_RIGHT)
            if _r.random() < 0.5:
                from PIL import Image as _I

                img = img.transpose(_I.FLIP_TOP_BOTTOM)
            img = T.color_jitter(img, 0.2, 0.3, 0.3, 0.1, p=0.5)
            img = T.GaussianBlur(p=0.5, radius_max=1)(img)
            if _r.random() < 0.2:
                img = img.convert("L").convert("RGB")
            if dev_norm:
                return np.asarray(img, np.uint8)
            return T.normalize_image(img)

        # center-crop -> 1.15x zoom resize -> center-crop -> normalize;
        # carries the pooled-batch protocol so the O(N^2) scan and eval
        # loaders prepare whole batches in the native C++ pool
        val_transform = T.OneImgEvalZoom(img_size, emit_u8=dev_norm)

        return {"train": train_transform, "validation": val_transform,
                "val": val_transform, "test": val_transform}

    def get_dataloader(self, mode):
        if mode in self.data_loader_registers:
            return self.data_loader_registers[mode]
        if mode != "train":
            raise Exception("Only Train mode should be executed")
        dataset, _repeat = build_dataset(mode=mode, config=self.config,
                                         transforms=self.get_transforms())
        max_len = len(dataset) * 20
        self.logger.info(f"[{mode}] Dataset length: {max_len}")
        sampler = MPerClassSampler(dataset.data_labels, m=3,
                                   length_before_new_iter=max_len,
                                   seed=self.config.SEED + self.rank)
        loader = DataLoader(dataset, sampler=sampler,
                            batch_size=local_batch_size(self.config.DATA.BATCH_SIZE,
                                                        self.mesh),
                            num_workers=self.config.DATA.NUM_WORKERS, drop_last=True)
        self.data_loader_registers[mode] = loader
        return loader

    # -------------------------------------------------------- geshaem eval
    def geshaem_test(self, key="geshaem_test"):
        """Score all Geshaem pairs, aggregate duplicate fragment pairs by
        mean/min, report both mAPs (michigan.py:168-237)."""
        transform = self.get_transforms()["validation"]
        if key in self.data_loader_registers:
            dataset = self.data_loader_registers[key]
        else:
            dataset = GeshaemPatch(self.geshaem_data_path, GeshaemPatch.Split.VAL,
                                   transform=transform)
            self.data_loader_registers[key] = dataset

        import jax
        import jax.numpy as jnp

        fwd = jax.jit(lambda p, x: self.model.apply({"params": p}, x))
        params = self.local_params()
        loader = DataLoader(dataset, batch_size=self.config.DATA.TEST_BATCH_SIZE,
                            num_workers=self.config.DATA.NUM_WORKERS)

        batch_time = AverageMeter()
        end = time.time()
        distance_map = {}
        index_to_fragment = {i: x for i, x in enumerate(dataset.fragments)}
        frag_of = np.asarray([dataset.data_labels[i] for i in range(len(dataset.data))])
        for idx, (images, pairs) in enumerate(loader):
            output = np.asarray(fwd(params, jnp.asarray(images)),
                                np.float32).reshape(-1)
            for pair, score in zip(np.asarray(pairs), output):
                i_lbl, j_lbl = int(pair[0]), int(pair[1])
                frag_i = index_to_fragment[i_lbl]
                frag_j = index_to_fragment[j_lbl]
                distance_map.setdefault(frag_i, {}).setdefault(frag_j, []).append(1 - score)
                distance_map.setdefault(frag_j, {}).setdefault(frag_i, []).append(1 - score)
            batch_time.update(time.time() - end)
            end = time.time()
            if idx % self.config.PRINT_FREQ == 0:
                etas = batch_time.avg * (len(loader) - idx)
                self.logger.info(f"Testing: [{idx}/{len(loader)}]\t"
                                 f"eta {datetime.timedelta(seconds=int(etas))}\t"
                                 f"time {batch_time.val:.4f} ({batch_time.avg:.4f})")

        stds = []
        mean_distance_map, min_distance_map = {}, {}
        for source in distance_map:
            for dest in distance_map[source]:
                vals = distance_map[source][dest]
                avg_dis = sum(vals) / len(vals)
                if len(vals) > 1:
                    stds.append(statistics.stdev(vals))
                mean_distance_map.setdefault(source, {})[dest] = avg_dis
                min_distance_map.setdefault(source, {})[dest] = min(vals)

        if stds:
            avg_std = sum(stds) / len(stds)
            std_std = statistics.stdev(stds) if len(stds) > 1 else 0.0
            self.logger.info(f"N categories: {len(distance_map)}\t"
                             f"Avg_Std {avg_std:.3f}\t Std_Std {std_std:.3f}")

        import pandas as pd

        pos_pairs = dataset.fragment_to_group
        dist_df = pd.DataFrame.from_dict(mean_distance_map, orient="index")
        dist_df = dist_df.reindex(columns=dist_df.index)
        mean_m_ap, (top_1, prk5, prk10) = calc_map_prak(
            dist_df.to_numpy(), dist_df.columns, pos_pairs, prak=(1, 5, 10))
        self.logger.info(f"Geshaem test MEAN: mAP {mean_m_ap:.3f}\tTop 1 {top_1:.3f}\t"
                         f"Pr@k5 {prk5:.3f}\tPr@k10 {prk10:.3f}")

        dist_df = pd.DataFrame.from_dict(min_distance_map, orient="index")
        dist_df = dist_df.reindex(columns=dist_df.index)
        min_m_ap, (top_1, prk5, prk10) = calc_map_prak(
            dist_df.to_numpy(), dist_df.columns, pos_pairs, prak=(1, 5, 10))
        self.logger.info(f"Geshaem test MIN: mAP {min_m_ap:.3f}\tTop 1 {top_1:.3f}\t"
                         f"Pr@k5 {prk5:.3f}\tPr@k10 {prk10:.3f}")
        return 1 - max(mean_m_ap, min_m_ap)

    # -------------------------------------------------------- michigan eval
    def validate_dataloader(self, split, remove_cache_file=False):
        transform = self.get_transforms()[split.value]
        if "michigan_test" in self.data_loader_registers:
            dataset = self.data_loader_registers["michigan_test"]
        else:
            dataset = MichiganTest(
                self.config.DATA.DATA_PATH, split, transforms=transform,
                val_n_items_per_writer=self.config.DATA.EVAL_N_ITEMS_PER_CATEGORY)
            self.data_loader_registers["michigan_test"] = dataset

        if remove_cache_file:
            import glob as _glob

            for f in _glob.glob(os.path.join(self.config.OUTPUT,
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
        self.logger.info("Distance matrix is generated!")
        return distance_matrix, dataset.data_labels

    def validate(self):
        if self.geshaem_data_path:
            self.geshaem_test()
        distance_matrix, labels = self.validate_dataloader(
            MichiganTest.Split.VAL, remove_cache_file=True)
        m_ap, top1, pr_k10, pr_k100 = get_metrics(distance_matrix.astype(np.float32),
                                                  np.asarray(labels))
        self.logger.info(f"Michigan eval: mAP {m_ap:.3f}\tTop 1 {top1:.3f}\t"
                         f"Pr@k10 {pr_k10:.3f}\tPr@k100 {pr_k100:.3f}")
        return 1 - m_ap


def _coarse_dropout(img, max_holes=16, min_holes=3, min_size=16, max_size=64,
                    fill_value=255, p=0.9):
    """albumentations CoarseDropout equivalent (michigan.py:75-77)."""
    import random as _r

    if _r.random() >= p:
        return img
    arr = np.asarray(img).copy()
    h, w = arr.shape[:2]
    for _ in range(_r.randint(min_holes, max_holes)):
        hh = _r.randint(min_size, max_size)
        ww = _r.randint(min_size, max_size)
        y = _r.randint(0, max(h - hh, 1))
        x = _r.randint(0, max(w - ww, 1))
        arr[y:y + hh, x:x + ww] = fill_value
    from PIL import Image

    return Image.fromarray(arr)


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = MichiganTrainer(args)
    trainer.geshaem_data_path = args.geshaem_data_path
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "test":
        trainer.geshaem_test()
    elif args.mode == "throughput":
        trainer.throughput()
    else:
        trainer.train()
