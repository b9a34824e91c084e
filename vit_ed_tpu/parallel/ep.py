"""Expert-parallel parameter sharding for MoE ViT-ED variants.

The expert bank's leaves (models/moe.py: ``w1/b1/w2/b2`` of every
``mlp`` with a leading num_experts dim) are placed split over an
``expert`` mesh axis; everything else — including the router — stays
replicated. The dispatch/combine einsums contract the token axis
against the expert-major [E, ...] tensors, so XLA's SPMD partitioner
turns them into the MoE all-to-alls (GShard); no manual collectives.

EP composes with plain data parallelism (the standard deployment:
mesh ("data", "expert")) and, because expert leaves are disjoint from
the Megatron TP leaves, with TENSOR_PARALLEL and FSDP too — see
parallel/compose.py for the per-leaf stacking of the three rules.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_EXPERT_LEAVES = ("w1", "b1", "w2", "b2")


def ep_param_specs(params: Any, expert_axis: str = "expert") -> Any:
    """PartitionSpec pytree: expert-bank leaves split on dim 0."""

    def spec(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        parent = names[-2] if len(names) >= 2 else ""
        leaf_name = names[-1] if names else ""
        if parent == "mlp" and leaf_name in _EXPERT_LEAVES and leaf.ndim >= 2:
            return P(expert_axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def ep_param_shardings(params: Any, mesh: Mesh,
                       expert_axis: str = "expert") -> Any:
    specs = ep_param_specs(params, expert_axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_ep(params: Any, mesh: Mesh,
                    expert_axis: str = "expert") -> Any:
    """device_put the param tree with EP shardings over the mesh."""
    shardings = ep_param_shardings(params, mesh, expert_axis)
    return jax.tree.map(jax.device_put, params, shardings)
