"""Checkpoint I/O (orbax).

Semantic parity with the reference single-file torch checkpoints
(/root/reference/misc/utils.py:20-180): the saved tree carries
{params, opt_state, epoch, min_loss, step}; config is dumped alongside as
YAML. ``auto_resume_helper`` picks the newest checkpoint in OUTPUT by mtime;
``load_pretrained`` re-inits a mismatched classifier head to zero
(utils.py:110-119).
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_SUFFIX = ".ckpt"

# One long-lived async checkpointer: saves return immediately and complete
# in the background (orbax StandardCheckpointer is an AsyncCheckpointer);
# the next save/load/exit waits for the in-flight one. Hides the
# multi-second per-epoch save stall behind the next epoch's compute.
_ckptr = None
_ckptr_lock = threading.Lock()


def _get_ckptr() -> ocp.StandardCheckpointer:
    global _ckptr
    with _ckptr_lock:
        if _ckptr is None:
            _ckptr = ocp.StandardCheckpointer()
            atexit.register(_ckptr.wait_until_finished)
        return _ckptr


def wait_for_pending_saves() -> None:
    if _ckptr is not None:
        _ckptr.wait_until_finished()


def _ckpt_path(output_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(output_dir, name + CKPT_SUFFIX))


def save_checkpoint(config, epoch: int, state: Dict[str, Any], min_loss: float,
                    logger, name: str, block: bool = False) -> str:
    """Save {params, opt_state, step} + scalars to OUTPUT/<name>.ckpt.

    Asynchronous by default: the call returns once the device arrays are
    snapshotted; serialization overlaps subsequent training. Pass
    ``block=True`` (or call wait_for_pending_saves) to force completion.
    """
    path = _ckpt_path(config.OUTPUT, name)
    logger.info(f"{path} saving......")
    tree = dict(state)
    tree["epoch"] = np.asarray(epoch, np.int64)
    tree["min_loss"] = np.asarray(min_loss, np.float64)
    ckptr = _get_ckptr()
    ckptr.wait_until_finished()          # serialize with any in-flight save
    ckptr.save(path, tree, force=True)   # collective: every process calls
    if block:
        ckptr.wait_until_finished()
    if jax.process_index() == 0:
        # the yaml dump is a plain file write — single writer only
        with open(os.path.join(config.OUTPUT, "config.yaml"), "w") as f:
            f.write(config.dump())
    logger.info(f"{path} save dispatched" if not block else f"{path} saved !!!")
    return path


def load_checkpoint(path: str, abstract_state: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint tree; with abstract_state, restores with matching
    shardings/dtypes."""
    ckptr = _get_ckptr()
    ckptr.wait_until_finished()          # a pending save may target this path
    if abstract_state is not None:
        tree = dict(abstract_state)
        tree.setdefault("epoch", np.asarray(0, np.int64))
        tree.setdefault("min_loss", np.asarray(0.0, np.float64))
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))


def auto_resume_helper(output_dir: str) -> Optional[str]:
    """Newest *.ckpt in output_dir by mtime (misc/utils.py:170-180)."""
    if not os.path.isdir(output_dir):
        return None
    ckpts = [os.path.join(output_dir, d) for d in os.listdir(output_dir)
             if d.endswith(CKPT_SUFFIX)]
    ckpts = [c for c in ckpts if os.path.isdir(c)]
    if not ckpts:
        return None
    return max(ckpts, key=os.path.getmtime)


def load_pretrained(config, params, logger):
    """Load pretrained params, zero-reinit head on class-count mismatch
    (misc/utils.py:48-127). Accepts either an orbax dir or a torch .pth file
    (converted via models.convert)."""
    path = config.MODEL.PRETRAINED
    logger.info(f"==============> Loading weight {path} for fine-tuning......")
    if path.endswith(".pth") or path.endswith(".pt"):
        from vit_ed_tpu.models.convert import torch_checkpoint_to_params

        loaded = torch_checkpoint_to_params(path, config)
    else:
        tree = load_checkpoint(path)
        loaded = tree["params"] if "params" in tree else tree

    loaded = dict(loaded)
    if "head" in loaded and "head" in params:
        n_c1 = np.asarray(loaded["head"]["bias"]).shape[0]
        n_c2 = np.asarray(params["head"]["bias"]).shape[0]
        if n_c1 != n_c2:
            logger.warning("Error in loading classifier head, re-init classifier head to 0")
            loaded["head"] = jax.tree.map(lambda x: np.zeros_like(x), params["head"])

    merged, missing, unexpected = _merge_params(params, loaded)
    _upcycle_moe(merged, loaded, logger)
    if missing:
        logger.warning(f"Missing keys: {sorted(missing)[:20]} ...")
    if unexpected:
        logger.warning(f"Unexpected keys: {sorted(unexpected)[:20]} ...")
    logger.info(f"=> loaded successfully '{path}'")
    return merged


def _upcycle_moe(merged, loaded, logger):
    """Sparse upcycling: when a DENSE checkpoint is loaded into a MoE
    config, initialise every expert of each Switch bank (models/moe.py:
    w1/b1/w2/b2) from the dense block's fc1/fc2 — the standard dense->MoE
    warm start. The router stays at its random init (there is nothing to
    upcycle it from); shapes must match exactly or the bank is skipped."""
    n = 0
    for name, blk in merged.items():
        mlp = blk.get("mlp") if isinstance(blk, dict) else None
        src_blk = loaded.get(name) if isinstance(loaded, dict) else None
        src = src_blk.get("mlp") if isinstance(src_blk, dict) else None
        if not (isinstance(mlp, dict) and "w1" in mlp
                and isinstance(src, dict) and "fc1" in src and "w2" in mlp):
            continue
        e = np.asarray(mlp["w1"]).shape[0]
        pairs = [("w1", "b1", "fc1"), ("w2", "b2", "fc2")]
        if any(np.asarray(mlp[w]).shape[1:] != np.asarray(src[fc]["kernel"]).shape
               or np.asarray(mlp[b]).shape[1:] != np.asarray(src[fc]["bias"]).shape
               for w, b, fc in pairs):
            logger.warning(f"Sparse upcycling skipped for {name}: dense MLP "
                           f"shapes do not match the expert bank")
            continue
        for w, b, fc in pairs:
            mlp[w] = np.broadcast_to(
                np.asarray(src[fc]["kernel"]),
                (e,) + np.asarray(src[fc]["kernel"]).shape).copy()
            mlp[b] = np.broadcast_to(
                np.asarray(src[fc]["bias"]),
                (e,) + np.asarray(src[fc]["bias"]).shape).copy()
        n += 1
    if n:
        logger.info(f"Sparse upcycling: initialised {n} expert banks from "
                    f"the dense checkpoint's MLPs")


def _merge_params(base, loaded, prefix=""):
    """Non-strict state-dict merge: keep base where loaded is absent."""
    missing, unexpected = set(), set()
    if not isinstance(base, dict):
        return loaded, missing, unexpected
    merged = {}
    for k, v in base.items():
        if k in loaded:
            if isinstance(v, dict):
                sub, m, u = _merge_params(v, loaded[k], prefix + k + "/")
                merged[k] = sub
                missing |= m
                unexpected |= u
            else:
                merged[k] = np.asarray(loaded[k]).reshape(np.asarray(v).shape) \
                    if np.asarray(loaded[k]).size == np.asarray(v).size else v
                if np.asarray(loaded[k]).size != np.asarray(v).size:
                    missing.add(prefix + k)
        else:
            merged[k] = v
            missing.add(prefix + k)
    for k in loaded:
        if k not in base:
            unexpected.add(prefix + k)
    return merged, missing, unexpected
