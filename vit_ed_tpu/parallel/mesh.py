"""Device mesh and sharding helpers.

This replaces the reference's NCCL process-group plumbing
(/root/reference/misc/utils.py:319-344 ``configure_ddp``) with a
``jax.sharding.Mesh``: one ``data`` axis carries data parallelism for
training (grad all-reduce inserted by XLA over ICI) and tiles the pairwise
score matrix at eval. A ``model`` axis is reserved for tensor-parallel
sharding of larger variants.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialise multi-host JAX when launched under a cluster.

    Mirrors the env:// rendezvous of configure_ddp: coordinator address from
    COORDINATOR_ADDRESS / MASTER_ADDR, process count/id from env or SLURM.
    Single-host runs skip initialisation entirely.
    """
    num_proc = (os.environ.get("JAX_NUM_PROCESSES")
                or os.environ.get("WORLD_SIZE")
                or os.environ.get("SLURM_NTASKS"))
    if not num_proc or int(num_proc) <= 1:
        return  # single-process launch; don't touch the backend
    already = False
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax: fall back to the internal state
        from jax._src import distributed as _dist

        already = _dist.global_state.coordinator_address is not None
    if already:
        return
    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        addr = os.environ.get("MASTER_ADDR", "localhost")
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator = f"{addr}:{port}"
    proc_id = int(os.environ.get("RANK", os.environ.get("SLURM_PROCID", "0")))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_proc), process_id=proc_id)


def create_mesh(mesh_shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    """Create a mesh; default is 1-D over all devices on the ``data`` axis."""
    if devices is None:
        devices = jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),)
        axis_names = axis_names[: 1]
    devs = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(devs, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(per_device_batch: int, mesh: Mesh) -> int:
    """Per-process batch for a given per-device batch size."""
    n_local = len([d for d in mesh.devices.flat if d.process_index == jax.process_index()])
    return per_device_batch * max(n_local, 1)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_host_batch(batch, mesh: Mesh, spec: P):
    """Build GLOBAL arrays from per-process local batches.

    Single-process this is a plain sharded device_put. Multi-process, each
    process holds only its local slice of the global batch (the DDP data
    semantic, reference misc/engine.py:156-187), so the global array is
    assembled with make_array_from_process_local_data — device_put of a
    local array with a global sharding would mis-declare the global shape.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if np.ndim(x) > 1 else x,
            batch)
    return jax.tree_util.tree_map(
        lambda x: (jax.make_array_from_process_local_data(sharding, np.asarray(x))
                   if np.ndim(x) > 1 else x),
        batch)


def local_mesh(mesh: Mesh) -> Mesh:
    """A single-process mesh over this process's devices from ``mesh``.

    Per-process independent jit programs (e.g. the pairwise scorer's row
    ranges, where every process computes DIFFERENT data) must not be
    launched over a multi-process mesh — under SPMD all processes must
    execute one consistent global computation. This collapses the mesh to
    the local devices, keeping the first axis name.
    """
    if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
        return mesh
    devs = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    return Mesh(np.asarray(devs), (mesh.axis_names[0],))
