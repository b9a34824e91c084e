"""Worker process for the multi-process (multi-host) CPU tests and the
driver dryrun's spawned phase.

Launched by tests/test_multiprocess.py (2 processes x 4 devices) or
__graft_entry__.dryrun_multichip (4 processes x 2 devices) with
RANK/WORLD_SIZE/MASTER_* env vars; MP_LOCAL_DEVICES sets each process's
virtual CPU device count (default 4). Verifies, in order:

1. maybe_init_distributed env:// rendezvous (mesh.py)
2. a data-parallel train step over the GLOBAL mesh with per-process local
   batches (shard_host_batch) — params must stay identical across ranks
3. the PairwiseScorer row-range split + process_allgather slab merge
4. collective orbax checkpointing: EVERY process calls save, then restore

Results are written to <outdir>/rank<i>_<name>.npy for the parent to check.
"""

import os
import sys


def scan_only(outdir, rank, world, n_local):
    """MP_SCAN_ONLY mode: just the sharded O(N^2) scan with npz-block
    resumability; MP_CRASH_AFTER=k hard-kills THIS rank after its k-th
    image load (mid-scan, after some blocks were cached) — the restart
    must resume from the cached blocks and produce the identical matrix
    (the reference's crash story, hisfrag.py:179-195, 260-276)."""
    import jax
    import numpy as np

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.parallel.mesh import create_mesh
    from vit_ed_tpu.parallel.pairs import PairwiseScorer

    mesh = create_mesh()
    model = ViTED(img_size=32, patch_size=16, num_classes=2, embed_dim=32,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))["params"]

    img_rng = np.random.default_rng(0)   # same dataset every run
    imgs = img_rng.normal(size=(12, 32, 32, 3)).astype(np.float32)
    crash_after = int(os.environ.get("MP_CRASH_AFTER", "0"))
    loads = [0]

    class _DS:
        def __getitem__(self, i):
            loads[0] += 1
            if crash_after and loads[0] > crash_after:
                os._exit(17)   # simulated hard crash mid-scan
            return imgs[i], i

        def __len__(self):
            return len(imgs)

    scorer = PairwiseScorer(model, params, mesh, num_outputs=2, pair_chunk=8)
    sim = scorer.score_dataset(_DS(), batch_size=2, rank=rank,
                               world_size=world, num_workers=0,
                               out_dir=outdir, tag="resume", resume=True)
    np.save(os.path.join(outdir, f"scan_rank{rank}_sim.npy"), sim)
    with open(os.path.join(outdir, f"scan_rank{rank}_ok"), "w") as f:
        f.write("ok")


def preempt_train(outdir, rank, world, n_local):
    """MP_PREEMPT_TRAIN mode: run the REAL Trainer (main.DefaultTrainer)
    across 2 processes. The parent SIGTERMs exactly ONE rank mid-training;
    the PreemptionGuard's collective agreement must make BOTH ranks save
    the same checkpoint at the same optimizer step and exit 0. A second
    spawn (same outdir) auto-resumes and must continue the interrupted
    epoch from the exact step (utils/preempt.py, train/engine.py)."""
    import json
    import time

    import jax
    import numpy as np

    from main import DefaultTrainer

    class Args:
        cfg = os.path.join(outdir, "cfg.yaml")
        opts = None
        batch_size = None
        data_path = os.path.join(outdir, "data")
        pretrained = None
        resume = None
        accumulation_steps = None
        use_checkpoint = None
        disable_amp = True
        output = os.path.join(outdir, "out")
        tag = "mp"
        mode = "train"
        eval = None
        throughput = None
        optim = None
        keep_attn = None
        eval_n_items_per_category = None

    marker = os.path.join(outdir, f"trainstep_rank{rank}")

    class StepMarkTrainer(DefaultTrainer):
        """Marks optimizer-step progress for the parent (which waits for
        the first step before delivering SIGTERM) and widens the per-step
        window so the signal lands mid-loop deterministically."""

        def _aot_step(self, *a):
            out = super()._aot_step(*a)
            with open(marker, "a") as f:
                f.write("x")
            time.sleep(0.05)
            return out

    trainer = StepMarkTrainer(Args())
    state = trainer.train()
    leaf = np.asarray(jax.device_get(jax.tree.leaves(state.params)[0]))
    np.save(os.path.join(outdir, f"preempt_rank{rank}_leaf.npy"), leaf)
    with open(os.path.join(outdir, f"preempt_rank{rank}.json"), "w") as f:
        json.dump({"preempted": bool(trainer.preempted),
                   "step": int(jax.device_get(state.step)),
                   "start_epoch": int(trainer.start_epoch),
                   "skip": int(getattr(trainer, "_resume_skip_opt_steps", 0)),
                   "steps_per_epoch": len(trainer.get_dataloader("train")),
                   "epochs": int(trainer.config.TRAIN.EPOCHS)}, f)
    with open(os.path.join(outdir, f"preempt_rank{rank}_ok"), "w") as f:
        f.write("ok")


def main():
    outdir = sys.argv[1]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    n_local = int(os.environ.get("MP_LOCAL_DEVICES", "4"))
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}").strip()

    from vit_ed_tpu.parallel.mesh import (
        create_mesh,
        maybe_init_distributed,
        replicated_sharding,
        shard_host_batch,
    )

    maybe_init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    rank = jax.process_index()
    world = jax.process_count()
    expected_world = int(os.environ["WORLD_SIZE"])
    assert world == expected_world, f"expected {expected_world} processes, got {world}"
    n_total = world * n_local
    assert len(jax.devices()) == n_total, jax.devices()
    assert len(jax.local_devices()) == n_local

    if os.environ.get("MP_SCAN_ONLY") == "1":
        scan_only(outdir, rank, world, n_local)
        return

    if os.environ.get("MP_PREEMPT_TRAIN") == "1":
        preempt_train(outdir, rank, world, n_local)
        return

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.parallel.pairs import PairwiseScorer
    from vit_ed_tpu.train.engine import TrainState, make_train_step
    from vit_ed_tpu.train.losses import bce_with_logits
    from vit_ed_tpu.train.optim import build_optimizer, cosine_schedule
    from vit_ed_tpu.config import default_config

    mesh = create_mesh()

    model = ViTED(img_size=32, patch_size=16, num_classes=2, embed_dim=32,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    x0 = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    host_params = jax.device_get(
        jax.jit(model.init)(jax.random.PRNGKey(0), x0))["params"]
    rep = replicated_sharding(mesh)
    params = jax.tree.map(lambda a: jax.device_put(a, rep), host_params)

    # ---- 2. DP train step over the global mesh -------------------------
    cfg = default_config()
    tx = build_optimizer(cfg, cosine_schedule(1e-3, 1e-5, 1e-6, 100, 10), params)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, bce_with_logits, accum_steps=1)

    rng = np.random.default_rng(100 + rank)  # DIFFERENT local data per rank
    local_bs = n_total // world   # one global sample per device
    local = {
        "samples": rng.normal(size=(1, local_bs, 2, 32, 32, 3)).astype(np.float32),
        "targets": (rng.random(size=(1, local_bs, 2)) > 0.5).astype(np.float32),
    }
    batch = shard_host_batch(local, mesh, P(None, "data"))
    assert batch["samples"].shape == (1, n_total, 2, 32, 32, 3)  # global batch
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)
    leaf = np.asarray(jax.device_get(jax.tree.leaves(state.params)[0]))
    np.save(os.path.join(outdir, f"rank{rank}_param_leaf.npy"), leaf)
    np.save(os.path.join(outdir, f"rank{rank}_loss.npy"), np.float64(loss))

    # ---- 3. sharded pairwise scan + allgather merge --------------------
    img_rng = np.random.default_rng(0)  # SAME dataset on every process
    imgs = img_rng.normal(size=(10, 32, 32, 3)).astype(np.float32)

    class _DS:
        def __getitem__(self, i):
            return imgs[i], i

        def __len__(self):
            return len(imgs)

    scorer = PairwiseScorer(model, state.params, mesh, num_outputs=2,
                            pair_chunk=8)
    sim = scorer.score_dataset(_DS(), batch_size=4, rank=rank,
                               world_size=world, num_workers=0)
    np.save(os.path.join(outdir, f"rank{rank}_sim.npy"), sim)

    # ---- 3a. assemble=False: complete rows via the slab-by-slab broadcast
    # exchange (no process ever allocates N x N); rows must equal the
    # assembled matrix's rows
    rows, my_range = scorer.score_dataset(_DS(), batch_size=4, rank=rank,
                                          world_size=world, num_workers=0,
                                          assemble=False)
    np.testing.assert_array_equal(rows, sim[my_range.start:my_range.stop])
    np.save(os.path.join(outdir, f"rank{rank}_rows.npy"), rows)
    np.save(os.path.join(outdir, f"rank{rank}_rowrange.npy"),
            np.asarray([my_range.start, my_range.stop]))

    # ---- 3b. multi-host tensor parallelism: 2-D (data=2, model=4) mesh,
    # Megatron column/row sharded params across BOTH processes ------------
    from vit_ed_tpu.parallel.mesh import create_mesh as _cm
    from vit_ed_tpu.parallel.tp import shard_params_tp

    # data axis = one shard per PROCESS so every process contributes one
    # local sample; model axis spans the remaining devices
    mesh2d = _cm((world, n_total // world), axis_names=("data", "model"))
    tp_params = shard_params_tp(host_params, mesh2d)
    tp_state = TrainState(params=tp_params, opt_state=tx.init(tp_params),
                          step=jnp.zeros((), jnp.int32))
    rng_tp = np.random.default_rng(200 + rank)
    tp_local = {
        "samples": rng_tp.normal(size=(1, 1, 2, 32, 32, 3)).astype(np.float32),
        "targets": (rng_tp.random(size=(1, 1, 2)) > 0.5).astype(np.float32),
    }
    tp_batch = shard_host_batch(tp_local, mesh2d, P(None, "data"))
    assert tp_batch["samples"].shape == (1, world, 2, 32, 32, 3)
    tp_state, tp_metrics = step(tp_state, tp_batch, jax.random.PRNGKey(9))
    tp_loss = float(jax.device_get(tp_metrics["loss"]))
    assert np.isfinite(tp_loss)
    np.save(os.path.join(outdir, f"rank{rank}_tp_loss.npy"), np.float64(tp_loss))

    # ---- 3c. multi-host FSDP (ZeRO-3): params + moments sharded over the
    # global 'data' axis across BOTH processes; same fresh params + batch
    # + rng as the DP step, so the loss must match it ---------------------
    from vit_ed_tpu.parallel.fsdp import shard_params_fsdp

    fsdp_params = shard_params_fsdp(host_params, mesh, min_size=256)
    fsdp_state = TrainState(params=fsdp_params, opt_state=tx.init(fsdp_params),
                            step=jnp.zeros((), jnp.int32))
    fsdp_state, fsdp_metrics = step(fsdp_state, batch, jax.random.PRNGKey(7))
    fsdp_loss = float(jax.device_get(fsdp_metrics["loss"]))
    assert abs(fsdp_loss - loss) < 1e-5, (fsdp_loss, loss)
    fc1 = fsdp_state.params["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert "data" in fc1.sharding.spec
    np.save(os.path.join(outdir, f"rank{rank}_fsdp_loss.npy"),
            np.float64(fsdp_loss))

    # ---- 4. collective orbax save/restore ------------------------------
    from vit_ed_tpu.train import checkpoint as ckpt

    class _Logger:
        def info(self, *a, **k):
            pass

    cfg.defrost()
    cfg.OUTPUT = outdir
    cfg.freeze()
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    ckpt.save_checkpoint(cfg, 3, tree, 0.5, _Logger(), "mp_ckpt")

    abstract = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    restored = ckpt.load_checkpoint(os.path.join(outdir, "mp_ckpt.ckpt"), abstract)
    r_leaf = np.asarray(jax.device_get(jax.tree.leaves(restored["params"])[0]))
    np.testing.assert_allclose(r_leaf, leaf, rtol=1e-6)
    assert int(restored["epoch"]) == 3

    with open(os.path.join(outdir, f"rank{rank}_ok"), "w") as f:
        f.write("ok")


if __name__ == "__main__":
    main()
