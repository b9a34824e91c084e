"""Composition of the parameter-sharding rules (TP ∘ EP ∘ FSDP).

Each rule owns disjoint leaves, so they stack per leaf:

- **TP** (parallel/tp.py): attention/MLP kernels column/row-split over
  ``model`` — Megatron's layout.
- **EP** (parallel/ep.py): MoE expert banks split over ``expert`` —
  the GShard layout. Expert leaves (w1/b1/w2/b2) and TP leaves
  (qkv/proj/fc1/fc2 kernels) never overlap.
- **FSDP** (parallel/fsdp.py): every leaf the first two left fully
  replicated is split over ``data`` — ZeRO-3 as the fallback rule,
  DeepSpeed-MoE / Megatron-distributed-optimizer style.

The composed spec tree is what the Trainer places new params with when
more than one of TPU.TENSOR_PARALLEL / EXPERT_PARALLEL / FSDP is on
(tests/test_compose_parallel.py locks numerics against plain DP).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_ed_tpu.parallel.ep import ep_param_specs
from vit_ed_tpu.parallel.fsdp import DEFAULT_MIN_SIZE, fsdp_param_specs
from vit_ed_tpu.parallel.tp import tp_param_specs

_is_spec = lambda x: isinstance(x, P)


def composed_param_specs(params: Any, *, tp: bool = False, ep: bool = False,
                         fsdp: bool = False, data_axis_size: int = 1,
                         min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """PartitionSpec pytree with the enabled rules stacked per leaf."""
    specs = jax.tree.map(lambda _: P(), params)

    def overlay(a, b):
        if a != P() and b != P():
            raise ValueError(f"conflicting shardings {a} vs {b}")
        return b if a == P() else a

    if tp:
        specs = jax.tree.map(overlay, specs, tp_param_specs(params),
                             is_leaf=_is_spec)
    if ep:
        specs = jax.tree.map(overlay, specs, ep_param_specs(params),
                             is_leaf=_is_spec)
    if fsdp:
        fallback = fsdp_param_specs(params, data_axis_size,
                                    min_size=min_size)
        specs = jax.tree.map(lambda s, f: f if s == P() else s,
                             specs, fallback, is_leaf=_is_spec)
    return specs


def shard_params_composed(params: Any, mesh: Mesh, *, tp: bool = False,
                          ep: bool = False, fsdp: bool = False,
                          min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """device_put the param tree under the composed sharding rules."""
    specs = composed_param_specs(
        params, tp=tp, ep=ep, fsdp=fsdp,
        data_axis_size=mesh.shape.get("data", 1), min_size=min_size)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs)
