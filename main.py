"""DIV2K puzzle-pair training/eval entry point
(re-creates /root/reference/main.py).

Usage:
    python main.py --cfg configs/puzzle/div2k_erosion7_4bin_patch8_64.yaml \
        --data-path <path> [--mode train|eval|throughput] [--opts KEY V ...]
"""

import argparse
import datetime
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.train.engine import Trainer
from vit_ed_tpu.train.losses import bce_with_logits
from vit_ed_tpu.utils import AverageMeter


def parse_option():
    parser = argparse.ArgumentParser("Pajigsaw training and evaluation script",
                                     add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE",
                        help="path to config file")
    parser.add_argument("--opts", help="Modify config options by adding 'KEY VALUE' pairs.",
                        default=None, nargs="+")
    parser.add_argument("--batch-size", type=int, help="batch size for single device")
    parser.add_argument("--data-path", type=str, help="path to dataset")
    parser.add_argument("--pretrained", help="pretrained weight from checkpoint")
    parser.add_argument("--resume", help="resume from checkpoint")
    parser.add_argument("--accumulation-steps", type=int, help="gradient accumulation steps")
    parser.add_argument("--use-checkpoint", action="store_true",
                        help="whether to use gradient rematerialisation to save memory")
    parser.add_argument("--disable_amp", action="store_true", help="Disable bf16 compute")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    parser.add_argument("--mode", type=str, choices=["train", "eval", "throughput"],
                        default="train")
    parser.add_argument("--optim", type=str, help="overwrite optimizer if provided")
    return parser.parse_known_args()


class DefaultTrainer(Trainer):
    """4-bin BCE trainer + sklearn-style validation metrics
    (reference main.py:44-132)."""

    def get_criterion(self):
        return bce_with_logits

    def validate(self):
        from sklearn.metrics import accuracy_score, f1_score, precision_score, recall_score

        data_loader = self.get_dataloader("validation")
        criterion = self.get_criterion()
        batch_time = AverageMeter()
        loss_meter = AverageMeter()
        acc_meter = AverageMeter()
        f1_meter = AverageMeter()
        precision_meter = AverageMeter()
        recall_meter = AverageMeter()

        fwd = jax.jit(lambda p, x: self.model.apply({"params": p}, x))
        params = self.local_params()

        start = time.time()
        end = time.time()
        for idx, (images, target) in enumerate(data_loader):
            images = jnp.asarray(images)
            output = np.asarray(fwd(params, images), np.float32)
            loss = float(np.asarray(
                criterion(jnp.asarray(output), jnp.asarray(target))))

            accuracies, f1s, precisions, recalls = [], [], [], []
            for c in range(output.shape[1]):
                pred = (output[:, c] > 0).astype(np.float32)
                gt = target[:, c]
                accuracies.append(accuracy_score(gt, pred) * 100)
                f1s.append(f1_score(gt, pred, average="macro"))
                precisions.append(precision_score(gt, pred, average="macro",
                                                  zero_division=0))
                recalls.append(recall_score(gt, pred, average="macro",
                                            zero_division=0))

            n = target.shape[0]
            loss_meter.update(loss, n)
            acc_meter.update(sum(accuracies) / len(accuracies), n)
            f1_meter.update(sum(f1s) / len(f1s), n)
            precision_meter.update(sum(precisions) / len(precisions), n)
            recall_meter.update(sum(recalls) / len(recalls), n)
            batch_time.update(time.time() - end)
            end = time.time()

            if idx % self.config.PRINT_FREQ == 0:
                self.logger.info(
                    f"Eval: [{idx}/{len(data_loader)}]\t"
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                    f"Loss {loss_meter.val:.4f} ({loss_meter.avg:.4f})\t"
                    f"ACC {acc_meter.val:.3f} ({acc_meter.avg:.3f})\t"
                    f"F1 {f1_meter.val:.3f} ({f1_meter.avg:.3f})\t"
                    f"Precision {precision_meter.val:.3f} ({precision_meter.avg:.3f})\t"
                    f"Recall {recall_meter.val:.3f} ({recall_meter.avg:.3f})")

        loss_meter.all_reduce()
        acc_meter.all_reduce()
        f1_meter.all_reduce()
        precision_meter.all_reduce()
        recall_meter.all_reduce()
        test_time = datetime.timedelta(seconds=int(time.time() - start))
        self.logger.info(
            f"Overall: Time {test_time}\tLoss {loss_meter.avg:.4f}\t"
            f"ACC {acc_meter.avg:.3f}\tF1 {f1_meter.avg:.3f}\t"
            f"Precision {precision_meter.avg:.3f}\tRecall {recall_meter.avg:.3f}")
        return loss_meter.avg


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = DefaultTrainer(args)
    if args.mode == "eval":
        trainer.validate()
    elif args.mode == "throughput":
        trainer.throughput()
    else:
        trainer.train()
