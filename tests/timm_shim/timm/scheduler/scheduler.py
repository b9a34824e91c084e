"""timm.scheduler.scheduler.Scheduler shim (pre-0.9 API surface).

Vendored semantics of timm's Scheduler base class (Ross Wightman,
Apache-2.0): ``step``/``step_update`` dispatch to the subclass's
``get_epoch_values``/``get_update_values`` hooks and write the values
back into the optimizer's param groups. The reference's own schedulers
(/root/reference/misc/lr_scheduler.py:65-151) subclass this API, and the
trajectory-parity test drives the reference trainer through it — so this
must reproduce timm faithfully, not our optax re-implementation.
Noise options are accepted but not implemented (the reference never
enables them).
"""

import torch


class Scheduler:
    def __init__(self, optimizer: torch.optim.Optimizer,
                 param_group_field: str,
                 noise_range_t=None, noise_pct=0.67, noise_std=1.0,
                 noise_seed=None, initialize=True):
        self.optimizer = optimizer
        self.param_group_field = param_group_field
        self._initial_param_group_field = f"initial_{param_group_field}"
        if initialize:
            for i, group in enumerate(self.optimizer.param_groups):
                if param_group_field not in group:
                    raise KeyError(
                        f"{param_group_field} missing from param_groups[{i}]")
                group.setdefault(self._initial_param_group_field,
                                 group[param_group_field])
        else:
            for i, group in enumerate(self.optimizer.param_groups):
                if self._initial_param_group_field not in group:
                    raise KeyError(
                        f"{self._initial_param_group_field} missing from "
                        f"param_groups[{i}]")
        self.base_values = [group[self._initial_param_group_field]
                            for group in self.optimizer.param_groups]
        self.metric = None
        assert noise_range_t is None, "noise schedules not implemented in shim"

    def state_dict(self):
        return {key: value for key, value in self.__dict__.items()
                if key != "optimizer"}

    def load_state_dict(self, state_dict):
        self.__dict__.update(state_dict)

    def get_epoch_values(self, epoch: int):
        return None

    def get_update_values(self, num_updates: int):
        return None

    def step(self, epoch: int, metric: float = None) -> None:
        self.metric = metric
        values = self.get_epoch_values(epoch)
        if values is not None:
            self.update_groups(values)

    def step_update(self, num_updates: int, metric: float = None):
        self.metric = metric
        values = self.get_update_values(num_updates)
        if values is not None:
            self.update_groups(values)

    def update_groups(self, values):
        if not isinstance(values, (list, tuple)):
            values = [values] * len(self.optimizer.param_groups)
        for param_group, value in zip(self.optimizer.param_groups, values):
            param_group[self.param_group_field] = value
