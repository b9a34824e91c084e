"""Geshaem standard evaluation entry point
(re-creates /root/reference/geshame_evaluation.py).

Scores the precomputed all-pairs list sharded across processes and fills
a symmetric similarity matrix. The reference's padded ``all_gather``
(geshame_evaluation.py:61-75) becomes a host allgather of the per-process
score arrays (no -1 padding protocol needed)."""

import argparse
import datetime
import os
import time

import numpy as np

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.data.geshaem import GeshaemPatch
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import DistributedEvalSampler
from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.utils import AverageMeter

from hisfrag import HisfragTrainer


def eval_standard(config, trainer, logger, world_size, rank):
    import jax
    import jax.numpy as jnp

    patch_size = config.DATA.IMG_SIZE

    # center_crop + normalize with the fused native fast path
    transform = T.OneImgEval(patch_size, crop=True)

    dataset = GeshaemPatch(config.DATA.DATA_PATH, GeshaemPatch.Split.VAL,
                           transform=transform)
    sampler = DistributedEvalSampler(len(dataset), num_replicas=world_size, rank=rank)
    dataloader = DataLoader(dataset, sampler=sampler,
                            batch_size=config.DATA.TEST_BATCH_SIZE,
                            num_workers=config.DATA.NUM_WORKERS)

    fwd = jax.jit(lambda p, x: trainer.model.apply({"params": p}, x))
    params = trainer.local_params()

    predicts = []
    my_indices = list(iter(sampler))
    batch_time = AverageMeter()
    end = time.time()
    pos = 0
    for idx, (images, pair_labels) in enumerate(dataloader):
        output = np.asarray(fwd(params, jnp.asarray(images)),
                            np.float32).reshape(-1)
        batch_indices = my_indices[pos: pos + len(output)]
        pos += len(output)
        pairs = dataset.pairs[batch_indices]
        predicts.append(np.column_stack([pairs.astype(np.float32), output]))
        batch_time.update(time.time() - end)
        end = time.time()
        if idx % config.PRINT_FREQ == 0:
            etas = batch_time.avg * (len(dataloader) - idx)
            logger.info(f"Testing: [{idx}/{len(dataloader)}]\t"
                        f"eta {datetime.timedelta(seconds=int(etas))}\t"
                        f"time {batch_time.val:.4f} ({batch_time.avg:.4f})")

    predicts = (np.concatenate(predicts, axis=0) if predicts
                else np.zeros((0, 3), np.float32))

    if world_size > 1:
        from jax.experimental.multihost_utils import process_allgather

        # pad to a common length, then drop the padding (reference pads
        # with -1 in the first column, geshame_evaluation.py:61-75)
        max_n = int(len(dataset.pairs) * 1.2 / world_size) + 1
        padded = np.full((max_n, 3), -1, np.float32)
        padded[: len(predicts)] = predicts
        gathered = np.asarray(process_allgather(padded)).reshape(-1, 3)
        predicts = gathered[gathered[:, 0] != -1]

    assert len(predicts) == len(dataset.pairs), \
        f"Incorrect size {predicts.shape} vs {dataset.pairs.shape}"
    size = len(dataset.data)

    similarity_matrix = np.zeros((size, size), np.float16)
    indices = predicts[:, :2].astype(np.int64)
    scores = predicts[:, 2].astype(np.float16)
    similarity_matrix[indices[:, 0], indices[:, 1]] = scores
    similarity_matrix[indices[:, 1], indices[:, 0]] = scores
    distance_matrix = 1 - similarity_matrix

    labels, fragment_idxs = [], []
    for i in range(size):
        im_name = os.path.basename(os.path.dirname(os.path.dirname(dataset.data[i])))
        labels.append(im_name)
        fragment_idxs.append(dataset.data_labels[i])
    return distance_matrix.astype(np.float32), labels, np.asarray(fragment_idxs)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Geshaem testing script", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--mode", type=str, default="eval")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    args, unparsed = parser.parse_known_args()

    trainer = HisfragTrainer(args)
    logger = trainer.logger

    start_time = time.time()
    distance_matrix, img_names, fragment_idxs = eval_standard(
        trainer.config, trainer, logger, trainer.world_size, trainer.rank)
    logger.info("Starting to calculate performance...")
    logger.info(f"Distance matrix shape: {distance_matrix.shape}")
    m_ap2, top1, pr_a_k10, pr_a_k100 = get_metrics(distance_matrix, fragment_idxs)
    total_time_str = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f"mAP {m_ap2:.3f}\tTop 1 {top1:.3f}\tPr@k10 {pr_a_k10:.3f}\t"
                f"Pr@k100 {pr_a_k100:.3f} Time: {total_time_str}")
