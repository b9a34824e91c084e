"""Fully-sharded data parallelism (ZeRO-3 the XLA way).

The reference replicates every parameter on every GPU (DDP,
SURVEY.md §2.7); at ViT-S that is fine, but larger variants and their
AdamW moments outgrow a single chip's HBM. The TPU-native answer is not
a wrapper class around bucketed all-gathers — it is a *sharding*: place
each parameter leaf split over the existing ``data`` mesh axis and let
XLA's SPMD partitioner insert the all-gather before use in the forward
pass and the reduce-scatter on the gradient transpose. The optimizer
then updates only the local 1/N shard of every leaf (params, grads AND
AdamW moments all live sharded), which is exactly ZeRO stage 3.

Layout rule: shard the largest dimension divisible by the axis size
(ties break toward the trailing dim, which is the lane dimension on
TPU and keeps the gathered tiles MXU-friendly); leaves smaller than
``min_size`` elements stay replicated — gathering a LayerNorm scale
costs more in collective latency than the bytes saved.

Composes with the rest of the config surface: ``TPU.FSDP: true`` plus
the unmodified CLI is all a user needs (tests/test_config_parallel.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# below this many elements a leaf stays replicated: the per-step gather
# latency outweighs the HBM saved (norm scales, biases, CLS token)
DEFAULT_MIN_SIZE = 4096


def fsdp_param_specs(params: Any, axis_size: int, axis: str = "data",
                     min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """PartitionSpec pytree: each large leaf split over ``axis``."""

    def spec(leaf):
        if leaf.ndim == 0 or leaf.size < min_size:
            return P()
        best = None
        for d in range(leaf.ndim):
            if leaf.shape[d] % axis_size == 0 and (
                    best is None or leaf.shape[d] >= leaf.shape[best]):
                best = d
        if best is None:
            return P()
        parts = [None] * leaf.ndim
        parts[best] = axis
        return P(*parts)

    return jax.tree.map(spec, params)


def fsdp_param_shardings(params: Any, mesh: Mesh, axis: str = "data",
                         min_size: int = DEFAULT_MIN_SIZE) -> Any:
    specs = fsdp_param_specs(params, mesh.shape[axis], axis, min_size)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_fsdp(params: Any, mesh: Mesh, axis: str = "data",
                      min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """device_put the param tree with FSDP shardings over the mesh."""
    shardings = fsdp_param_shardings(params, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
