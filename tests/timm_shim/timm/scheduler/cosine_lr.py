"""timm.scheduler.cosine_lr.CosineLRScheduler shim.

Vendored semantics of timm's cosine scheduler (Ross Wightman,
Apache-2.0) for the configuration space the reference uses
(/root/reference/misc/lr_scheduler.py:23-33: cycle_limit=1,
t_in_epochs=False, optional warmup_prefix, no noise, no k-decay).
This is the schedule the reference trainer ACTUALLY runs — the
trajectory-parity test compares our optax schedule against it.
"""

import math

import torch

from .scheduler import Scheduler


class CosineLRScheduler(Scheduler):
    def __init__(self, optimizer: torch.optim.Optimizer, t_initial: int,
                 lr_min: float = 0.0, cycle_mul: float = 1.0,
                 cycle_decay: float = 1.0, cycle_limit: int = 1,
                 warmup_t=0, warmup_lr_init=0, warmup_prefix=False,
                 t_in_epochs=True, noise_range_t=None, noise_pct=0.67,
                 noise_std=1.0, noise_seed=42, k_decay=1.0, initialize=True):
        super().__init__(optimizer, param_group_field="lr",
                         noise_range_t=noise_range_t, noise_pct=noise_pct,
                         noise_std=noise_std, noise_seed=noise_seed,
                         initialize=initialize)
        assert t_initial > 0
        assert lr_min >= 0
        assert cycle_mul == 1.0 and k_decay == 1.0, \
            "cycle_mul/k_decay != 1 not implemented in shim"
        self.t_initial = t_initial
        self.lr_min = lr_min
        self.cycle_decay = cycle_decay
        self.cycle_limit = cycle_limit
        self.warmup_t = warmup_t
        self.warmup_lr_init = warmup_lr_init
        self.warmup_prefix = warmup_prefix
        self.t_in_epochs = t_in_epochs
        if self.warmup_t:
            self.warmup_steps = [(v - warmup_lr_init) / self.warmup_t
                                 for v in self.base_values]
            super().update_groups(self.warmup_lr_init)
        else:
            self.warmup_steps = [1 for _ in self.base_values]

    def _get_lr(self, t):
        if t < self.warmup_t:
            lrs = [self.warmup_lr_init + t * s for s in self.warmup_steps]
        else:
            if self.warmup_prefix:
                t = t - self.warmup_t
            i = t // self.t_initial
            t_i = self.t_initial
            t_curr = t - t_i * i
            gamma = self.cycle_decay ** i
            lr_max_values = [v * gamma for v in self.base_values]
            if i < self.cycle_limit:
                lrs = [self.lr_min + 0.5 * (lr_max - self.lr_min)
                       * (1 + math.cos(math.pi * t_curr / t_i))
                       for lr_max in lr_max_values]
            else:
                lrs = [self.lr_min for _ in self.base_values]
        return lrs

    def get_epoch_values(self, epoch: int):
        if self.t_in_epochs:
            return self._get_lr(epoch)
        return None

    def get_update_values(self, num_updates: int):
        if not self.t_in_epochs:
            return self._get_lr(num_updates)
        return None
