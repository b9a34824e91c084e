"""Tensor-parallel parameter sharding (GSPMD) for larger ViT-ED variants.

The reference trains ViT-S with data parallelism only (SURVEY.md §2.7:
TP "not needed ... optional head/FFN sharding axis `model` for larger
variants"). This module provides that optional axis the TPU way: shard the
parameter leaves over a 2-D ("data", "model") mesh and let XLA's SPMD
partitioner propagate shardings and insert the collectives.

Layout (Megatron-style column/row split, communication-minimal):
- attention qkv / q / kv kernels, mlp fc1: column-parallel  [in, out/model]
- attention proj, mlp fc2:                row-parallel      [in/model, out]
- biases of column-parallel layers:       sharded on model
- everything else (norms, embeddings, head, patch conv): replicated
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("qkv", "q", "kv", "fc1")
_ROW_PARALLEL = ("proj", "fc2")


def tp_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for tensor-parallel params."""

    def spec(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        parent = names[-2] if len(names) >= 2 else ""
        leaf_name = names[-1] if names else ""
        if leaf.ndim == 2 and parent in _COLUMN_PARALLEL and leaf_name == "kernel":
            return P(None, model_axis)
        if leaf.ndim == 2 and parent in _ROW_PARALLEL and leaf_name == "kernel":
            return P(model_axis, None)
        if leaf.ndim == 1 and parent in _COLUMN_PARALLEL and leaf_name == "bias":
            return P(model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_param_shardings(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    specs = tp_param_specs(params, model_axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put the param tree with TP shardings over the mesh."""
    shardings = tp_param_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
