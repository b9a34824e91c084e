"""Training engine.

TPU-native re-design of the reference Trainer template
(/root/reference/misc/engine.py:24-283). The template-method surface is
kept — ``get_criterion`` / ``get_transforms`` / ``get_dataloader`` /
``prepare_data`` / ``train_step`` hooks, ``train()`` / ``validate()`` /
``throughput()`` — but the inner loop is one jitted, donated XLA program:

- grad accumulation is a ``lax.scan`` over a stacked microbatch axis
  (reference: loss/accum + scaler update_grad, engine.py:212-231)
- bf16 compute / f32 params replaces CUDA AMP + GradScaler (TPU bf16 needs
  no loss scaling)
- the device mesh ``data`` axis replaces DDP; XLA inserts the grad
  all-reduce over ICI
- LR schedule is evaluated inside the optimizer on the accumulated-step
  counter (reference lr_scheduler.step_update, engine.py:228)
"""

from __future__ import annotations

import datetime
import json
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vit_ed_tpu.config import get_config
from vit_ed_tpu.data.build import build_dataset
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import DistributedEvalSampler, DistributedRepeatSampler
from vit_ed_tpu.data.transforms import TwoImgSyncEval
from vit_ed_tpu.models import build_model
from vit_ed_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    local_batch_size,
    maybe_init_distributed,
    replicated_sharding,
)
from vit_ed_tpu.train import checkpoint as ckpt
from vit_ed_tpu.train.losses import bce_with_logits
from vit_ed_tpu.train.optim import build_optimizer, build_schedule
from vit_ed_tpu.utils import AverageMeter, create_logger, set_seed


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array
    batch_stats: Any = None   # BatchNorm running stats (SimSiam/ResNet models)

    def apply_gradients(self, grads, tx, batch_stats=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
            batch_stats=batch_stats if batch_stats is not None else self.batch_stats,
        )


def make_train_step(model, tx, criterion: Callable, accum_steps: int,
                    loss_fn: Optional[Callable] = None,
                    has_batch_stats: bool = False,
                    moe_aux_weight: float = 0.0,
                    moe_z_weight: float = 0.0):
    """Build the jitted train step.

    ``loss_fn(model, params, batch, rng) -> loss`` defaults to the plain
    supervised pair loss. The returned function takes a batch whose leaves
    have a leading [accum_steps, ...] axis and returns (state, metrics).

    With ``has_batch_stats`` (BatchNorm models: SimSiam/ResNet baselines),
    the loss runs with a mutable ``batch_stats`` collection and the updated
    running stats are threaded through the state. Under jit-over-mesh the
    batch statistics are computed over the GLOBAL batch — the TPU
    equivalent of SyncBatchNorm (reference models/build.py:53 etc.).

    ``moe_aux_weight > 0`` (MoE models) makes the default loss collect the
    ``moe_aux`` collection the expert banks sow (models/moe.py) and add
    the weighted load-balance (+ router z-loss, ``moe_z_weight``) terms.
    A custom ``loss_fn`` that wants the aux terms must collect them
    itself (see ``models.moe.collect_moe_aux``).
    """

    if loss_fn is None:
        if moe_aux_weight and not has_batch_stats:
            from vit_ed_tpu.models.moe import collect_moe_aux

            def loss_fn(model, params, batch, rng):
                samples, targets = batch["samples"], batch["targets"]
                logits, mut = model.apply(
                    {"params": params}, samples, train=True,
                    rngs={"dropout": rng}, mutable=["moe_aux"])
                return (criterion(logits.astype(jnp.float32), targets)
                        + collect_moe_aux(mut, moe_aux_weight, moe_z_weight))
        elif has_batch_stats:
            def loss_fn(model, params, batch, rng, batch_stats):
                samples, targets = batch["samples"], batch["targets"]
                out, mutated = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    samples, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                logits = out[0] if isinstance(out, tuple) else out
                return (criterion(logits.astype(jnp.float32), targets),
                        mutated["batch_stats"])
        else:
            def loss_fn(model, params, batch, rng):
                samples, targets = batch["samples"], batch["targets"]
                logits = model.apply({"params": params}, samples, train=True,
                                     rngs={"dropout": rng})
                return criterion(logits.astype(jnp.float32), targets)

    def micro_grads(params, micro, rng, batch_stats=None):
        if has_batch_stats:
            (loss, new_stats), grads = jax.value_and_grad(
                lambda p: loss_fn(model, p, micro, rng, batch_stats),
                has_aux=True)(params)
            return loss, grads, new_stats
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, micro, rng))(params)
        return loss, grads, None

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        rngs = jax.random.split(rng, accum_steps)
        if accum_steps == 1:
            micro = jax.tree.map(lambda x: x[0], batch)
            loss, grads, new_stats = micro_grads(state.params, micro, rngs[0],
                                                 state.batch_stats)
        else:
            def body(carry, xs):
                micro, r = xs
                acc_loss, acc_g, stats = carry
                l, g, new_stats = micro_grads(state.params, micro, r, stats)
                return (acc_loss + l, jax.tree.map(jnp.add, acc_g, g),
                        new_stats), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum, new_stats), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero, state.batch_stats), (batch, rngs))
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)

        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads, tx, batch_stats=new_stats)
        return state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


class Trainer:
    """Template trainer. Subclasses override get_criterion / validate and
    optionally the data/loss hooks (reference misc/engine.py:24-283)."""

    def __init__(self, args):
        maybe_init_distributed()
        self.config = get_config(args)
        shape = self.config.TPU.MESH_SHAPE or None
        axes = tuple(self.config.TPU.MESH_AXES)
        if not axes:
            axes = ("data", "model")[:len(shape)] if shape else ("data",)
        self.mesh = create_mesh(shape, axis_names=axes)
        tpu = self.config.TPU
        if (tpu.TENSOR_PARALLEL or tpu.SEQ_PARALLEL) and "model" not in axes:
            raise ValueError("TPU.TENSOR_PARALLEL/SEQ_PARALLEL need a 'model' "
                             "mesh axis: set TPU.MESH_SHAPE [data, model] "
                             "(and TPU.MESH_AXES to rename axes)")
        if tpu.RING_ATTN and not tpu.SEQ_PARALLEL:
            raise ValueError("TPU.RING_ATTN requires TPU.SEQ_PARALLEL (the "
                             "token axis to ring over)")
        if tpu.FSDP and "data" not in axes:
            raise ValueError("TPU.FSDP shards over the 'data' mesh axis; "
                             "TPU.MESH_AXES must keep one")
        if tpu.EXPERT_PARALLEL:
            if "expert" not in axes:
                raise ValueError("TPU.EXPERT_PARALLEL needs an 'expert' mesh "
                                 "axis: set TPU.MESH_SHAPE [data, expert] and "
                                 "TPU.MESH_AXES ['data', 'expert']")
            n_exp = self.config.MODEL.PJS.MOE.EXPERTS
            if (self.config.MODEL.TYPE != "pjs" or n_exp <= 0
                    or n_exp % self.mesh.shape["expert"]):
                raise ValueError("TPU.EXPERT_PARALLEL needs a pjs model with "
                                 "MODEL.PJS.MOE.EXPERTS a positive multiple "
                                 "of the 'expert' axis size")
        if tpu.PIPELINE_STAGES > 1:
            if ("stage" not in axes
                    or self.mesh.shape["stage"] != tpu.PIPELINE_STAGES):
                raise ValueError(
                    "TPU.PIPELINE_STAGES needs a matching 'stage' mesh axis: "
                    "set TPU.MESH_SHAPE [data, stages] and TPU.MESH_AXES "
                    "['data', 'stage']")
            if (tpu.TENSOR_PARALLEL or tpu.SEQ_PARALLEL or tpu.FSDP
                    or tpu.EXPERT_PARALLEL):
                raise ValueError("TPU.PIPELINE_STAGES composes with data "
                                 "parallelism only (stage weights are "
                                 "shard_map-sharded, not GSPMD-sharded)")
            if self.config.MODEL.TYPE != "pjs":
                raise ValueError("TPU.PIPELINE_STAGES needs a pjs model "
                                 "(the stage-sharded blocks are ViTED's)")
            pjs = self.config.MODEL.PJS
            if pjs.DEPTH % tpu.PIPELINE_STAGES or \
                    pjs.C_DEPTH % tpu.PIPELINE_STAGES:
                raise ValueError(
                    f"TPU.PIPELINE_STAGES {tpu.PIPELINE_STAGES} must divide "
                    f"DEPTH {pjs.DEPTH} and C_DEPTH {pjs.C_DEPTH}")
            if self.config.MODEL.DROP_PATH_RATE or self.config.MODEL.DROP_RATE:
                raise ValueError(
                    "TPU.PIPELINE_STAGES requires MODEL.DROP_PATH_RATE 0 and "
                    "MODEL.DROP_RATE 0: stochastic-depth rates are a "
                    "per-layer linspace baked into module attributes, which "
                    "the homogeneous stage-stacked layers cannot carry")
            if pjs.MOE.EXPERTS > 0:
                raise ValueError("TPU.PIPELINE_STAGES does not compose with "
                                 "MoE encoder blocks")
        self.rank = jax.process_index()
        self.world_size = jax.process_count()
        self.n_devices = self.mesh.devices.size
        self.local_rank = 0

        seed = self.config.SEED + self.rank
        set_seed(seed)
        self.rng = jax.random.PRNGKey(seed)
        # rng for the jitted train step: common across processes (one
        # global SPMD program); per-rank randomness stays in data/aug
        self.step_rng = jax.random.PRNGKey(self.config.SEED)

        # linear LR scaling by global batch / 256 (+ accumulation), matching
        # misc/engine.py:33-47 with world_size -> number of mesh devices.
        batch_size = self.config.DATA.BATCH_SIZE * self.n_devices
        scale = batch_size / 256.0
        if self.config.TRAIN.ACCUMULATION_STEPS > 1:
            scale *= self.config.TRAIN.ACCUMULATION_STEPS
        self.config.defrost()
        self.config.TRAIN.BASE_LR = self.config.TRAIN.BASE_LR * scale
        self.config.TRAIN.WARMUP_LR = self.config.TRAIN.WARMUP_LR * scale
        self.config.TRAIN.MIN_LR = self.config.TRAIN.MIN_LR * scale
        self.config.freeze()

        os.makedirs(self.config.OUTPUT, exist_ok=True)
        self.logger = create_logger(output_dir=self.config.OUTPUT, dist_rank=self.rank,
                                    name=f"{self.config.MODEL.NAME}",
                                    affix=getattr(args, "mode", ""))
        if self.rank == 0:
            path = os.path.join(self.config.OUTPUT, "config.json")
            with open(path, "w") as f:
                json.dump(self.config.to_dict(), f, indent=2, default=str)
            self.logger.info(f"Full config saved to {path}")
        self.logger.info(f"devices: {self.n_devices} x {jax.devices()[0].platform}")

        self.logger.info(f"Creating model:{self.config.MODEL.TYPE}/{self.config.MODEL.NAME}")
        self.model = build_model(self.config, mesh=self.mesh)
        self.params = self._init_params()
        n_parameters = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        self.logger.info(f"number of params: {n_parameters}")

        self.min_loss = 99999.0
        self.start_epoch = self.config.TRAIN.START_EPOCH
        self._resume_path = None

        if self.config.TRAIN.AUTO_RESUME:
            resume_file = ckpt.auto_resume_helper(self.config.OUTPUT)
            if resume_file:
                if self.config.MODEL.RESUME:
                    self.logger.warning(
                        f"Auto-resume changing resume file from "
                        f"{self.config.MODEL.RESUME} to {resume_file}")
                self.config.defrost()
                self.config.MODEL.RESUME = resume_file
                self.config.freeze()
                self.logger.info(f"Auto resuming from {resume_file}")
            else:
                self.logger.info(
                    f"No checkpoint found in {self.config.OUTPUT}, ignoring auto resume")

        if self.config.MODEL.PRETRAINED and not self.config.MODEL.RESUME:
            self.params = ckpt.load_pretrained(self.config, self.params, self.logger)
            if (self.config.TPU.TENSOR_PARALLEL or self.config.TPU.FSDP
                    or self.config.TPU.EXPERT_PARALLEL):
                # the non-strict merge hands back host arrays; re-establish
                # the parallel shardings or the loaded leaves would ride
                # into the train step replicated
                self.params = self._shard_new_params(
                    jax.tree.map(lambda a: np.asarray(jax.device_get(a)),
                                 self.params))

        self.data_loader_registers: Dict[str, DataLoader] = {}

    # ------------------------------------------------------------------ setup
    def _example_input(self):
        """Dummy input for parameter init, keyed on model type."""
        s = self.config.DATA.IMG_SIZE
        if self.config.MODEL.TYPE in ("pjs", "ss"):
            return (jnp.zeros((1, 2, s, s, 3), jnp.float32),)
        return (jnp.zeros((1, s, s, 3), jnp.float32),)

    def _shard_new_params(self, host_params):
        """Place a fresh host-side param tree under the configured
        parallelism. The rules compose per leaf (parallel/compose.py):
        Megatron TP on attention/MLP kernels, EP on MoE expert banks,
        ZeRO-3 FSDP on whatever the first two left replicated."""
        tpu = self.config.TPU
        if tpu.TENSOR_PARALLEL or tpu.FSDP or tpu.EXPERT_PARALLEL:
            from vit_ed_tpu.parallel.compose import shard_params_composed

            return shard_params_composed(host_params, self.mesh,
                                         tp=tpu.TENSOR_PARALLEL,
                                         ep=tpu.EXPERT_PARALLEL,
                                         fsdp=tpu.FSDP)
        rep = replicated_sharding(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, rep), host_params)

    def _pp_view(self, params):
        """Standard replicated params -> the pipeline-parallel TrainState
        layout (blocks stacked and stage-sharded, parallel/pp.py); identity
        when TPU.PIPELINE_STAGES is off."""
        if self.config.TPU.PIPELINE_STAGES <= 1:
            return params
        from vit_ed_tpu.parallel.pp import (pp_shard_transformed,
                                            pp_transform_params)

        host = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), params)
        pjs = self.config.MODEL.PJS
        return pp_shard_transformed(
            pp_transform_params(host, pjs.DEPTH, pjs.C_DEPTH), self.mesh)

    def _eval_params(self, params):
        """TrainState params -> the standard replicated layout every
        eval/checkpoint-convert path consumes; identity unless the state
        is in the PP layout."""
        if self.config.TPU.PIPELINE_STAGES <= 1:
            return params
        from vit_ed_tpu.parallel.pp import pp_restore_params

        host = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), params)
        rep = replicated_sharding(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, rep),
                            pp_restore_params(host))

    def _init_params(self):
        rng = jax.random.PRNGKey(self.config.SEED)
        variables = jax.jit(self.model.init)(rng, *self._example_input())
        # keep any BatchNorm running-stats collection (SimSiam/ResNet model
        # types) alongside the params, always replicated
        rep = replicated_sharding(self.mesh)
        put = lambda tree: jax.tree.map(lambda x: jax.device_put(x, rep), tree)
        self.batch_stats = (put(variables["batch_stats"])
                            if "batch_stats" in variables else None)
        return self._shard_new_params(jax.device_get(variables["params"]))

    def model_variables(self):
        """The variables dict for inference-mode ``model.apply`` — includes
        BatchNorm running stats when the model carries them."""
        variables = {"params": self.params}
        if getattr(self, "batch_stats", None) is not None:
            variables["batch_stats"] = self.batch_stats
        return variables

    def local_params(self):
        """Params re-homed to this process's default device.

        Per-rank independent eval loops (each process forwards DIFFERENT
        batches) must not feed global-mesh arrays into their local jit
        programs — under SPMD a global-mesh computation has to be identical
        on every process. Single-process this is effectively a no-op."""
        if jax.process_count() == 1:
            return self.params
        params = self.params
        if (self.config.TPU.TENSOR_PARALLEL or self.config.TPU.FSDP
                    or self.config.TPU.EXPERT_PARALLEL):
            # mesh-sharded leaves aren't process-addressable: re-replicate
            # with one global all-gather first (every process calls this)
            rep = replicated_sharding(self.mesh)
            params = jax.jit(
                lambda t: t,
                out_shardings=jax.tree.map(lambda _: rep, params))(params)
        return jax.tree.map(
            lambda a: jax.device_put(np.asarray(jax.device_get(a)),
                                     jax.local_devices()[0]),
            params)

    # ------------------------------------------------------------- data hooks
    def get_transforms(self):
        transform = TwoImgSyncEval(self.config.DATA.IMG_SIZE)
        return {"train": transform, "validation": transform, "test": transform}

    def get_dataloader(self, mode):
        if mode in self.data_loader_registers:
            return self.data_loader_registers[mode]
        transforms = self.get_transforms()
        dataset, repeat = build_dataset(mode=mode, config=self.config,
                                        transforms=transforms)
        self.logger.info(f"rank {self.rank} successfully built {mode} dataset "
                         f"({len(dataset)} items, repeat {repeat})")

        lbs = local_batch_size(self.config.DATA.BATCH_SIZE, self.mesh)
        if mode == "train":
            sampler = DistributedRepeatSampler(
                len(dataset), num_replicas=self.world_size, rank=self.rank,
                shuffle=True, repeat=repeat, seed=self.config.SEED)
            loader = DataLoader(dataset, sampler=sampler, batch_size=lbs,
                                num_workers=self.config.DATA.NUM_WORKERS,
                                drop_last=True)
        else:
            sampler = DistributedEvalSampler(
                len(dataset), num_replicas=self.world_size, rank=self.rank,
                shuffle=self.config.TEST.SHUFFLE, repeat=repeat,
                seed=self.config.SEED)
            loader = DataLoader(dataset, sampler=sampler,
                                batch_size=local_batch_size(
                                    self.config.DATA.TEST_BATCH_SIZE, self.mesh),
                                num_workers=self.config.DATA.NUM_WORKERS,
                                drop_last=False)
        self.data_loader_registers[mode] = loader
        return loader

    # ------------------------------------------------------------ train hooks
    def get_criterion(self):
        raise NotImplementedError()

    def make_loss_fn(self, criterion):
        """Override to customise the in-jit loss computation.

        Returns loss_fn(model, params, batch, rng) or None for the default
        supervised pair loss."""
        return None

    def prepare_data(self, samples, targets):
        """Host-side batch massaging before device put (engine.py:186-187).
        Returns the dict batch consumed by the loss_fn."""
        return {"samples": samples, "targets": targets}

    # ------------------------------------------------------------------ train
    def train(self):
        config = self.config
        # install the guard FIRST: dataloader/optimizer construction, the
        # initial validate() and the first compile can take minutes on real
        # pods — a SIGTERM in that window must latch the flag so the first
        # cadence check acts on it instead of the process dying uncovered
        self.preempted = False
        self._preempt = None
        if config.TRAIN.PREEMPT_SAVE:
            from vit_ed_tpu.utils.preempt import PreemptionGuard

            self._preempt = PreemptionGuard(
                check_freq=config.TRAIN.PREEMPT_CHECK_FREQ).install()
        try:
            return self._train_inner()
        finally:
            # any exception path must restore the SIGTERM handler (a stale
            # guard reference otherwise outlives the trainer) and land
            # in-flight async saves before the process unwinds
            if self._preempt is not None:
                self._preempt.uninstall()
            ckpt.wait_for_pending_saves()

    def _train_inner(self):
        config = self.config
        data_loader = self.get_dataloader("train")
        accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)
        steps_per_epoch = len(data_loader) // accum
        schedule = build_schedule(config, steps_per_epoch)
        # pipeline parallelism: the TrainState (params + AdamW moments)
        # lives in the PP layout — blocks stacked [depth, ...] and
        # stage-sharded — for the whole training run; self.params keeps
        # the standard replicated layout for every eval/checkpoint path
        # (_eval_params converts after each epoch)
        state_params = self._pp_view(self.params)
        self.tx = build_optimizer(config, schedule, state_params)
        # jitted for the per-print lr readout: an un-jitted optax schedule
        # dispatches ~10 eager ops per call (each a round trip on remote
        # backends)
        self.schedule = jax.jit(schedule)
        has_batch_stats = self.batch_stats is not None
        state = TrainState(params=state_params,
                           opt_state=self.tx.init(state_params),
                           step=jnp.zeros((), jnp.int32),
                           batch_stats=self.batch_stats)
        # commit every leaf to the mesh: freshly-created uncommitted arrays
        # (the step counter, optax counters) hash differently from the
        # committed arrays the donated step returns, forcing a SECOND full
        # compile of the train step on its second call otherwise
        rep = replicated_sharding(self.mesh)
        state = jax.tree.map(
            lambda a: a if getattr(a, "committed", True)
            else jax.device_put(a, rep), state)

        criterion = self.get_criterion()
        # BatchNorm models (SimSiam/ResNet types) thread the running-stats
        # collection through the step; a custom make_loss_fn for such a model
        # must take (model, params, batch, rng, batch_stats) and return
        # (loss, new_batch_stats).
        moe = self.config.MODEL.PJS.MOE
        is_moe = self.config.MODEL.TYPE == "pjs" and moe.EXPERTS > 0
        loss_fn = self.make_loss_fn(criterion)
        if config.TPU.PIPELINE_STAGES > 1:
            if loss_fn is not None:
                raise ValueError(
                    "TPU.PIPELINE_STAGES supports the default supervised "
                    "pair loss only (a custom make_loss_fn cannot route "
                    "through the stage-sharded blocks)")
            from vit_ed_tpu.parallel.pp import make_pp_loss_fn

            loss_fn = make_pp_loss_fn(
                self.model, self.mesh, criterion,
                config.TPU.PP_MICROBATCHES or config.TPU.PIPELINE_STAGES)
        self.train_step = make_train_step(self.model, self.tx, criterion, accum,
                                          loss_fn,
                                          has_batch_stats=has_batch_stats,
                                          moe_aux_weight=moe.AUX_WEIGHT if is_moe else 0.0,
                                          moe_z_weight=moe.Z_WEIGHT if is_moe else 0.0)

        self._resume_skip_opt_steps = 0
        if config.MODEL.RESUME:
            state, self.min_loss, self.start_epoch = self._load_resume(state)
            self.params = self._eval_params(state.params)
            self.batch_stats = state.batch_stats
            # fast-forward the step rng by the optimizer steps already
            # applied so post-resume in-step randomness (dropout) matches
            # an uninterrupted run; skipped steps burn their split in
            # train_one_epoch, so only COMPLETED epochs advance here
            n_applied = int(jax.device_get(state.step))
            n_burn = n_applied - self._resume_skip_opt_steps
            if n_burn > 0:
                self.step_rng = jax.jit(
                    lambda key, n: jax.lax.fori_loop(
                        0, n, lambda i, k: jax.random.split(k)[0], key)
                )(self.step_rng, n_burn)
            loss = self.validate()
            self.min_loss = min(loss, self.min_loss)
            self.logger.info(f"Loss of the network on the val set: {loss:.4f}")

        self.logger.info("Start training...")
        start_time = time.time()
        self.params = self._eval_params(state.params)
        loss = self.validate()
        self.logger.info(f"Init loss: {loss}")
        for epoch in range(self.start_epoch, config.TRAIN.EPOCHS):
            state = self.train_one_epoch(epoch, data_loader, state, criterion)
            self.params = self._eval_params(state.params)
            self.batch_stats = state.batch_stats
            if self.preempted:
                # the preemption checkpoint was already saved inside the
                # epoch; skip validate/best-model work — the grace window
                # is for flushing the save, not for more compute
                self.logger.info(
                    f"Preempted during epoch {epoch}: checkpoint saved, "
                    "exiting cleanly (auto-resume will continue this epoch "
                    "from the exact interrupted step)")
                break

            # every process participates: orbax coordinates multi-host saves
            # of sharded arrays only when all processes call save together
            if (epoch % config.SAVE_FREQ == 0
                    or epoch == config.TRAIN.EPOCHS - 1):
                self._save(state, epoch, "checkpoint")

            loss = self.validate()
            if loss < self.min_loss:
                self._save(state, epoch, "best_model")
                self.logger.info(f"Loss is reduced from {self.min_loss} to {loss}")
            self.min_loss = min(self.min_loss, loss)

        ckpt.wait_for_pending_saves()   # async saves must land before return
        total_time = str(datetime.timedelta(seconds=int(time.time() - start_time)))
        self.logger.info(f"Training time {total_time}")
        return state

    def _save(self, state: TrainState, epoch: int, name: str,
              in_epoch_opt_steps: int = 0):
        """``in_epoch_opt_steps > 0`` marks a MID-epoch (preemption) save:
        ``epoch`` is the in-progress epoch and resume continues it from
        optimizer step ``in_epoch_opt_steps`` instead of replaying it."""
        tree = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step,
                "in_epoch_opt_steps": np.asarray(in_epoch_opt_steps, np.int64)}
        if state.batch_stats is not None:
            tree["batch_stats"] = state.batch_stats
        ckpt.save_checkpoint(self.config, epoch, tree, self.min_loss,
                             self.logger, name)

    def _load_resume(self, state: TrainState):
        self.logger.info(f"==============> Resuming from {self.config.MODEL.RESUME}....")
        abstract = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step,
                    "in_epoch_opt_steps": np.asarray(0, np.int64)}
        if state.batch_stats is not None:
            abstract["batch_stats"] = state.batch_stats
        try:
            tree = ckpt.load_checkpoint(self.config.MODEL.RESUME, abstract)
        except Exception:
            # checkpoints written before exact-step resume lack the
            # in_epoch_opt_steps scalar
            del abstract["in_epoch_opt_steps"]
            tree = ckpt.load_checkpoint(self.config.MODEL.RESUME, abstract)
        new_state = TrainState(params=tree["params"], opt_state=tree["opt_state"],
                               step=tree["step"],
                               batch_stats=tree.get("batch_stats"))
        min_loss = float(tree.get("min_loss", 99999.0))
        epoch = int(tree.get("epoch", -1))
        skip = int(tree.get("in_epoch_opt_steps", 0))
        if skip > 0:
            # mid-epoch (preemption) checkpoint: continue the SAME epoch,
            # skipping the optimizer steps it already consumed, so step
            # count / LR schedule / data order all match an uninterrupted
            # run exactly (samplers are deterministic per epoch)
            self._resume_skip_opt_steps = skip
            start_epoch = epoch
            self.logger.info(f"=> loaded successfully (epoch {epoch}, "
                             f"continuing from optimizer step {skip})")
        else:
            start_epoch = epoch + 1
            self.logger.info(f"=> loaded successfully (epoch {epoch})")
        return new_state, min_loss, start_epoch

    def _collate_accum(self, batches):
        """Stack a list of dict microbatches along a leading accum axis."""
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    def train_one_epoch(self, epoch, data_loader, state, criterion):
        config = self.config
        accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)
        num_steps = len(data_loader)
        batch_time = AverageMeter()
        loss_meter = AverageMeter()
        norm_meter = AverageMeter()
        # steady-state step-time estimate for the MFU report: train_step
        # dispatches are async and only the device_get at print points
        # synchronizes, so per-batch wall times are meaningless in
        # isolation — measure (time between syncs) / (steps between syncs)
        # and take the median, which is robust to the compile-inflated
        # intervals
        sync_rates = []
        last_sync = None
        steps_since_sync = 0

        # leaves carry a leading [accum, batch, ...] axis; shard the BATCH axis
        from jax.sharding import PartitionSpec as P

        from vit_ed_tpu.parallel.mesh import shard_host_batch

        spec = P(None, "data")
        start = time.time()
        end = time.time()

        # exact-step resume: skip the optimizer steps the interrupted run
        # already applied (burning the step rng to keep the sequence
        # aligned), so the resumed trajectory equals the uninterrupted one
        skip = (getattr(self, "_resume_skip_opt_steps", 0)
                if epoch == getattr(self, "start_epoch", epoch) else 0)

        micro_acc = []
        opt_idx = 0
        for idx, (samples, targets) in enumerate(data_loader):
            micro_acc.append(self.prepare_data(samples, targets))
            if len(micro_acc) < accum:
                continue

            if opt_idx < skip:
                micro_acc = []
                self.step_rng, _ = jax.random.split(self.step_rng)
                opt_idx += 1
                end = time.time()
                continue

            batch = self._collate_accum(micro_acc)
            micro_acc = []
            # each process contributes its local slice of the global batch
            batch = shard_host_batch(batch, self.mesh, spec)

            # the step rng must be IDENTICAL on every process: the jitted
            # step is one global SPMD program (a per-rank rng would hand
            # inconsistent replicated arguments to it)
            self.step_rng, step_rng = jax.random.split(self.step_rng)
            state, metrics = self._aot_step(state, batch, step_rng)
            opt_idx += 1
            steps_since_sync += 1

            if (getattr(self, "_preempt", None) is not None
                    and self._preempt.should_stop(opt_idx)):
                # all processes agree (the check is a collective), so the
                # orbax save below is correctly collective too. Saved
                # mid-epoch with the exact optimizer step: resume continues
                # this epoch from here instead of replaying it.
                self._save(state, epoch, "checkpoint",
                           in_epoch_opt_steps=opt_idx)
                ckpt.wait_for_pending_saves()
                self.preempted = True
                return state

            batch_time.update((time.time() - end) / accum)
            if idx % config.PRINT_FREQ < accum or idx == num_steps - 1:
                metrics = jax.device_get(metrics)   # sync point
                now = time.time()
                if last_sync is not None and steps_since_sync > 0:
                    sync_rates.append((now - last_sync) / steps_since_sync)
                last_sync = now
                steps_since_sync = 0
                loss_meter.update(metrics["loss"], np.shape(targets)[0] * accum)
                norm_meter.update(metrics["grad_norm"])
                lr = float(self.schedule(state.step - 1))
                etas = batch_time.avg * (num_steps - idx)
                self.logger.info(
                    f"Train: [{epoch}/{config.TRAIN.EPOCHS}][{idx}/{num_steps}]\t"
                    f"eta {datetime.timedelta(seconds=int(etas))} lr {lr:.6f}\t"
                    f"time {batch_time.val:.4f} ({batch_time.avg:.4f})\t"
                    f"loss {loss_meter.val:.4f} ({loss_meter.avg:.4f})\t"
                    f"grad_norm {norm_meter.val:.4f} ({norm_meter.avg:.4f})")
            end = time.time()

        epoch_time = time.time() - start
        self.logger.info(
            f"EPOCH {epoch} training takes {datetime.timedelta(seconds=int(epoch_time))}")
        if len(sync_rates) >= 3:   # a 1-2 interval median is just noise
            self._log_mfu(float(np.median(sync_rates)))
        loss_meter.all_reduce()
        return state

    def _aot_step(self, state, batch, rng):
        """Execute the train step, AOT-compiling it exactly once.

        The single AOT executable serves every call (signatures are static)
        and exposes cost_analysis for the MFU report WITHOUT a second
        compile — an AOT lower().compile() does not share the jit call
        cache, so mixing the two paths would compile the step twice (on
        remote backends that is minutes). Any AOT failure falls back to
        the plain jitted call permanently.
        """
        compiled = getattr(self, "_compiled_step", None)
        if compiled is None and not getattr(self, "_aot_failed", False):
            try:
                compiled = self.train_step.lower(state, batch, rng).compile()
                self._compiled_step = compiled
                self._capture_step_flops(compiled)
            except Exception:
                self._aot_failed = True
        if compiled is not None:
            try:
                return compiled(state, batch, rng)
            except (TypeError, ValueError):
                # input signature drifted (shouldn't happen with static
                # shapes) — drop to the jitted path permanently
                self._compiled_step = None
                self._aot_failed = True
        return self.train_step(state, batch, rng)

    def _capture_step_flops(self, compiled):
        """FLOPs of the compiled train step (PER-DEVICE cost analysis)."""
        try:
            analysis = compiled.cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            self._step_flops = float(analysis["flops"])
            self._flops_per_device = True
        except Exception:
            self._step_flops = None

    def _log_mfu(self, step_time: float):
        """Per-epoch utilisation report: step FLOPs / step time / peak.

        cost_analysis counts kernel-EXECUTED FLOPs (the pair-attention
        kernels execute 2x their useful FLOPs at head_dim 64), so this is
        HW utilisation, an upper bound on model-FLOP MFU — see
        scripts/bench_train_step.py for the analytic useful-FLOP number."""
        if getattr(self, "_step_flops", None) and step_time > 0:
            tfs = self._step_flops / step_time / 1e12
            peak = self.config.TPU.PEAK_TFLOPS
            if not self._flops_per_device:
                peak *= self.n_devices
            self.logger.info(
                f"Device FLOPs executed: {self._step_flops / 1e9:.3f} GF/step"
                f" / {step_time * 1e3:.1f} ms (incl. host input time) = "
                f"{tfs:.2f} TF/s ({tfs / peak * 100:.1f}% HW utilisation of "
                f"{peak:.0f} TF/s peak; model-FLOP MFU is lower — "
                f"attention kernels execute 2x useful)")

    # ------------------------------------------------------------------- eval
    def validate(self):
        raise NotImplementedError()

    def throughput(self):
        """50 warmup + 30 timed forwards -> img/s (engine.py:266-283).

        Iterations run device-side under one lax.scan with a carry
        dependence (remote backends may otherwise hoist the loop-invariant
        body or return before the compute completes). With
        TPU.PROFILE_DIR set, a jax profiler trace of the timed region is
        written for TensorBoard."""
        from vit_ed_tpu.utils.profiler import maybe_trace

        data_loader = self.get_dataloader("validation")

        def multi(n, x, variables):
            def body(acc, _):
                xi = x + acc.astype(x.dtype) * 1e-24
                out = self.model.apply(variables, xi)
                out = out[0] if isinstance(out, tuple) else out
                return jnp.sum(out.astype(jnp.float32)) * 1e-12, None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
            return acc

        jmulti = jax.jit(multi, static_argnums=0)
        variables = self.model_variables()
        for images, _ in data_loader:
            images = jnp.asarray(images)
            batch_size = images.shape[0]
            np.asarray(jmulti(30, images, variables))  # compile + warm
            np.asarray(jmulti(30, images, variables))
            self.logger.info("throughput averaged with 30 times")
            with maybe_trace(self.config.TPU.PROFILE_DIR, "throughput"):
                tic1 = time.time()
                np.asarray(jmulti(30, images, variables))
                tic2 = time.time()
            throughput_val = 30 * batch_size / (tic2 - tic1)
            self.logger.info(f"batch_size {batch_size} throughput {throughput_val}")
            return throughput_val
