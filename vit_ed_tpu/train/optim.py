"""Optimizers and LR schedules (optax).

Reproduces the reference semantics:
- weight-decay exclusion for 1-D params and biases
  (/root/reference/misc/optimizer.py:32-46)
- AdamW / SGD-nesterov (misc/optimizer.py:12-29)
- step-wise schedules: cosine (timm, warmup-prefix), linear, step, multistep
  (misc/lr_scheduler.py:16-151); all step on the accumulated-step counter
  like lr_scheduler.step_update (misc/engine.py:228).
- linear LR scaling by global batch / 256 and accumulation steps
  (misc/engine.py:33-47) is applied by the Trainer before building these.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Schedules (return lr as a function of accumulated update step)
# ---------------------------------------------------------------------------

def cosine_schedule(base_lr: float, min_lr: float, warmup_lr: float,
                    total_steps: int, warmup_steps: int,
                    warmup_prefix: bool = True) -> Callable:
    """timm CosineLRScheduler semantics with cycle_limit=1, t_in_epochs=False.

    With warmup_prefix, the cosine phase spans (total - warmup) steps and t
    is measured from the end of warmup (misc/lr_scheduler.py:24-33).
    """
    t_initial = (total_steps - warmup_steps) if warmup_prefix else total_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * step / max(warmup_steps, 1)
        t = step - warmup_steps if warmup_prefix else step
        t = jnp.clip(t, 0, t_initial)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * t / max(t_initial, 1)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def linear_schedule(base_lr: float, warmup_lr: float, total_steps: int,
                    warmup_steps: int, lr_min_rate: float = 0.01) -> Callable:
    """LinearLRScheduler (misc/lr_scheduler.py:65-114)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * step / max(warmup_steps, 1)
        t = step - warmup_steps
        total_t = max(total_steps - warmup_steps, 1)
        lin = base_lr - (base_lr - base_lr * lr_min_rate) * (t / total_t)
        return jnp.where(step < warmup_steps, warm, lin)

    return schedule


def step_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                  decay_steps: int, decay_rate: float) -> Callable:
    """timm StepLRScheduler semantics (t_in_epochs=False)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * step / max(warmup_steps, 1)
        decayed = base_lr * decay_rate ** jnp.floor(step / max(decay_steps, 1))
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def multistep_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                       milestones: Sequence[int], gamma: float) -> Callable:
    """MultiStepLRScheduler (misc/lr_scheduler.py:117-151)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32) if len(milestones) else None

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * step / max(warmup_steps, 1)
        if ms is None:
            decayed = jnp.full_like(step, base_lr)
        else:
            n = jnp.sum(step >= ms)  # bisect_right over milestones
            decayed = base_lr * gamma ** n
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def build_schedule(config, n_iter_per_epoch: int) -> Callable:
    """build_scheduler (misc/lr_scheduler.py:16-62) on accumulated steps."""
    num_steps = int(config.TRAIN.EPOCHS * n_iter_per_epoch)
    warmup_steps = int(config.TRAIN.WARMUP_EPOCHS * n_iter_per_epoch)
    decay_steps = int(config.TRAIN.LR_SCHEDULER.DECAY_EPOCHS * n_iter_per_epoch)
    multi_steps = [i * n_iter_per_epoch for i in config.TRAIN.LR_SCHEDULER.MULTISTEPS]
    name = config.TRAIN.LR_SCHEDULER.NAME

    if name == "cosine":
        return cosine_schedule(config.TRAIN.BASE_LR, config.TRAIN.MIN_LR,
                               config.TRAIN.WARMUP_LR, num_steps, warmup_steps,
                               config.TRAIN.LR_SCHEDULER.WARMUP_PREFIX)
    if name == "linear":
        return linear_schedule(config.TRAIN.BASE_LR, config.TRAIN.WARMUP_LR,
                               num_steps, warmup_steps)
    if name == "step":
        return step_schedule(config.TRAIN.BASE_LR, config.TRAIN.WARMUP_LR,
                             warmup_steps, decay_steps,
                             config.TRAIN.LR_SCHEDULER.DECAY_RATE)
    if name == "multistep":
        return multistep_schedule(config.TRAIN.BASE_LR, config.TRAIN.WARMUP_LR,
                                  warmup_steps, multi_steps,
                                  config.TRAIN.LR_SCHEDULER.GAMMA)
    raise NotImplementedError(f"Unknown scheduler {name}")


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def weight_decay_mask(params) -> dict:
    """True where weight decay applies: multi-dim params that are not biases
    (misc/optimizer.py:32-46 — 1-D params and *.bias are excluded).

    Pipeline-parallel param trees stack the per-layer blocks into
    ``blocks_stacked`` / ``cross_blocks_stacked`` subtrees whose leaves
    carry a leading [depth] axis (parallel/pp.py) — the dimensionality
    rule shifts by one there so e.g. a stacked LayerNorm scale ([L, C],
    2-D) still reads as the 1-D no-decay param it is per layer."""
    import jax

    def decay(path, p):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        stacked = top in ("blocks_stacked", "cross_blocks_stacked")
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if p.ndim - (1 if stacked else 0) <= 1 or leaf_name == "bias":
            return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics, exactly: scale every grad by
    ``min(1, max_norm / (global_norm + 1e-6))`` (misc/utils.py:212-226 routes
    through torch's clip; torch adds the 1e-6 to the denominator and clamps
    the coefficient at 1, where optax's clip_by_global_norm divides by the
    bare norm — a 1e-6-relative per-step difference that trajectory-parity
    tests resolve)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init, update)


def build_optimizer(config, schedule: Callable, params) -> optax.GradientTransformation:
    """Optimizer with grad clipping folded in (reference clips before step,
    misc/utils.py:212-226)."""
    name = config.TRAIN.OPTIMIZER.NAME.lower()
    chain = []
    if config.TRAIN.CLIP_GRAD:
        chain.append(clip_by_global_norm_torch(config.TRAIN.CLIP_GRAD))

    if name == "adamw":
        chain.append(
            optax.adamw(
                learning_rate=schedule,
                b1=config.TRAIN.OPTIMIZER.BETAS[0],
                b2=config.TRAIN.OPTIMIZER.BETAS[1],
                eps=config.TRAIN.OPTIMIZER.EPS,
                weight_decay=config.TRAIN.WEIGHT_DECAY,
                mask=weight_decay_mask(params),
            )
        )
    elif name == "sgd":
        # SGD with nesterov momentum + decoupled-style weight decay applied
        # as in torch SGD (coupled L2): add wd*p to grads for decayed params.
        mask = weight_decay_mask(params)
        if config.TRAIN.WEIGHT_DECAY:
            chain.append(optax.masked(
                optax.add_decayed_weights(config.TRAIN.WEIGHT_DECAY), mask))
        chain.append(optax.sgd(learning_rate=schedule,
                               momentum=config.TRAIN.OPTIMIZER.MOMENTUM,
                               nesterov=True))
    else:
        raise NotImplementedError(f"Unknown optimizer {name}")

    return optax.chain(*chain)
