"""LR range test (re-creates /root/reference/lr_finder.py without the
ignite dependency): exponential LR sweep over training batches, loss curve
smoothing, Fastai-style suggestion = LR at the steepest loss descent."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_ed_tpu.train.engine import Trainer, TrainState
from vit_ed_tpu.train.losses import bce_with_logits


def parse_option():
    parser = argparse.ArgumentParser("LR finder script", add_help=False)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--numb-iter", type=int, default=100)
    parser.add_argument("--start-lr", type=float, default=1e-7)
    parser.add_argument("--end-lr", type=float, default=1e-2)
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", help="tag of experiment")
    parser.add_argument("--mode", type=str, choices=["lr_finder"], default="lr_finder")
    parser.add_argument("--optim", type=str)
    return parser.parse_known_args()


class LrFinderTrainer(Trainer):
    def get_criterion(self):
        return bce_with_logits

    def find_lr(self, num_iter=100, start_lr=1e-7, end_lr=1e-2,
                smooth_f=0.05, diverge_th=5.0):
        data_loader = self.get_dataloader("train")
        criterion = self.get_criterion()

        lrs = start_lr * (end_lr / start_lr) ** (np.arange(num_iter) / max(num_iter - 1, 1))

        lr_holder = {"lr": start_lr}
        tx = optax.adamw(lambda step: lr_holder["lr"],
                         weight_decay=self.config.TRAIN.WEIGHT_DECAY)

        def loss_of(params, samples, targets, rng):
            logits = self.model.apply({"params": params}, samples, train=True,
                                      rngs={"dropout": rng})
            return criterion(logits.astype(jnp.float32), targets)

        @jax.jit
        def step(params, opt_state, samples, targets, rng, lr):
            loss, grads = jax.value_and_grad(loss_of)(params, samples, targets, rng)
            # manual SGD-free: scale adamw updates by lr ratio via injected lr
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * (lr / start_lr), updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        params = self.params
        opt_state = tx.init(params)
        losses, used_lrs = [], []
        best_loss = None
        it = 0
        rng = jax.random.PRNGKey(0)
        while it < num_iter:
            for samples, targets in data_loader:
                if it >= num_iter:
                    break
                lr = float(lrs[it])
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state,
                                               jnp.asarray(samples),
                                               jnp.asarray(targets), sub, lr)
                loss = float(np.asarray(loss))
                if losses:
                    loss = smooth_f * loss + (1 - smooth_f) * losses[-1]
                losses.append(loss)
                used_lrs.append(lr)
                best_loss = loss if best_loss is None else min(best_loss, loss)
                if loss > diverge_th * best_loss:
                    self.logger.info("Stopping early, the loss has diverged")
                    it = num_iter
                    break
                it += 1

        losses = np.asarray(losses)
        used_lrs = np.asarray(used_lrs)
        # Fastai suggestion: LR at the steepest negative gradient
        if len(losses) > 3:
            grads = np.gradient(losses)
            suggestion = float(used_lrs[int(np.argmin(grads))])
        else:
            suggestion = float(used_lrs[-1]) if len(used_lrs) else start_lr

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(used_lrs, losses)
            ax.set_xscale("log")
            ax.set_xlabel("learning rate")
            ax.set_ylabel("loss")
            # the reference saves to cwd (lr_finder.py:62); anchor the
            # plot in the run's OUTPUT dir instead so repeated runs from
            # a source checkout don't litter it
            fig.savefig(os.path.join(self.config.OUTPUT,
                                     "lr_finder_result.jpg"))
        except Exception:
            pass

        self.logger.info(f"Lr suggestion: {suggestion}")
        return suggestion


if __name__ == "__main__":
    args, _ = parse_option()
    trainer = LrFinderTrainer(args)
    trainer.find_lr(num_iter=args.numb_iter, start_lr=args.start_lr,
                    end_lr=args.end_lr)
