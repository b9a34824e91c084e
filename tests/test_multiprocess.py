"""Multi-process (2 hosts x 4 virtual devices) CPU integration test.

Spawns two OS processes that rendezvous via jax.distributed (the env://
path of mesh.maybe_init_distributed, reference misc/utils.py:319-344) and
exercise the DP train step, the sharded pairwise scan merge, and
collective orbax checkpointing. The parent then checks cross-rank
consistency and equality with a single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "WORLD_SIZE": "2",
            "RANK": str(rank),
            "MASTER_ADDR": "localhost",
            "MASTER_PORT": str(port),
            "PYTHONPATH": _REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, outdir], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return outdir


def test_rendezvous_and_workers_succeed(mp_outputs):
    for rank in range(2):
        assert os.path.exists(os.path.join(mp_outputs, f"rank{rank}_ok"))


def test_dp_step_params_identical_across_ranks(mp_outputs):
    leaf0 = np.load(os.path.join(mp_outputs, "rank0_param_leaf.npy"))
    leaf1 = np.load(os.path.join(mp_outputs, "rank1_param_leaf.npy"))
    np.testing.assert_array_equal(leaf0, leaf1)
    loss0 = np.load(os.path.join(mp_outputs, "rank0_loss.npy"))
    loss1 = np.load(os.path.join(mp_outputs, "rank1_loss.npy"))
    assert loss0 == loss1


def test_scorer_merge_matches_single_process(mp_outputs):
    sim0 = np.load(os.path.join(mp_outputs, "rank0_sim.npy"))
    sim1 = np.load(os.path.join(mp_outputs, "rank1_sim.npy"))
    np.testing.assert_array_equal(sim0, sim1)

    # single-process reference on the in-process 8-device mesh
    import jax
    import jax.numpy as jnp

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.parallel.mesh import create_mesh
    from vit_ed_tpu.parallel.pairs import PairwiseScorer

    model = ViTED(img_size=32, patch_size=16, num_classes=2, embed_dim=32,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))["params"]

    # one DP train step with the same global batch the two ranks fed
    from jax.sharding import PartitionSpec as P

    from vit_ed_tpu.config import default_config
    from vit_ed_tpu.parallel.mesh import replicated_sharding, shard_host_batch
    from vit_ed_tpu.train.engine import TrainState, make_train_step
    from vit_ed_tpu.train.losses import bce_with_logits
    from vit_ed_tpu.train.optim import build_optimizer, cosine_schedule

    mesh = create_mesh()
    rep = replicated_sharding(mesh)
    params = jax.tree.map(lambda a: jax.device_put(a, rep), params)
    cfg = default_config()
    tx = build_optimizer(cfg, cosine_schedule(1e-3, 1e-5, 1e-6, 100, 10), params)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, bce_with_logits, accum_steps=1)

    parts = []
    for rank in range(2):
        rng = np.random.default_rng(100 + rank)
        parts.append({
            "samples": rng.normal(size=(1, 4, 2, 32, 32, 3)).astype(np.float32),
            "targets": (rng.random(size=(1, 4, 2)) > 0.5).astype(np.float32),
        })
    global_batch = {k: np.concatenate([p[k] for p in parts], axis=1)
                    for k in parts[0]}
    batch = shard_host_batch(global_batch, mesh, P(None, "data"))
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    loss_ref = float(jax.device_get(metrics["loss"]))
    loss_mp = float(np.load(os.path.join(mp_outputs, "rank0_loss.npy")))
    assert abs(loss_ref - loss_mp) < 1e-5

    img_rng = np.random.default_rng(0)
    imgs = img_rng.normal(size=(10, 32, 32, 3)).astype(np.float32)

    class _DS:
        def __getitem__(self, i):
            return imgs[i], i

        def __len__(self):
            return len(imgs)

    scorer = PairwiseScorer(model, state.params, mesh, num_outputs=2,
                            pair_chunk=8)
    sim_ref = scorer.score_dataset(_DS(), batch_size=4, num_workers=0)
    np.testing.assert_allclose(sim0, sim_ref, atol=2e-3)


def test_collective_checkpoint_restored(mp_outputs):
    # worker already asserted restore equality; the checkpoint dir must be
    # a valid single coordinated save
    assert os.path.isdir(os.path.join(mp_outputs, "mp_ckpt.ckpt"))


def test_multihost_tp_step_consistent(mp_outputs):
    """2-D (data=2, model=4) mesh spanning both processes: the TP train
    step runs and yields the same loss on every rank."""
    tp0 = np.load(os.path.join(mp_outputs, "rank0_tp_loss.npy"))
    tp1 = np.load(os.path.join(mp_outputs, "rank1_tp_loss.npy"))
    assert tp0 == tp1
    assert np.isfinite(tp0)


def test_multihost_fsdp_step_matches_dp(mp_outputs):
    """FSDP (ZeRO-3) over the global 'data' axis spanning both processes:
    same fresh params/batch/rng as the DP step, so the losses must match
    bit-for-bit-close across strategies AND across ranks (the worker also
    asserts the updated params stayed sharded)."""
    dp0 = np.load(os.path.join(mp_outputs, "rank0_loss.npy"))
    fs0 = np.load(os.path.join(mp_outputs, "rank0_fsdp_loss.npy"))
    fs1 = np.load(os.path.join(mp_outputs, "rank1_fsdp_loss.npy"))
    assert fs0 == fs1
    assert abs(fs0 - dp0) < 1e-5


def test_sharded_rows_reproduce_full_matrix_and_metrics(mp_outputs):
    """assemble=False rows (exchanged slab-by-slab across the 2 processes)
    must tile the assembled matrix exactly, and the row-sharded wi19
    partials must merge to the full-matrix metrics."""
    from vit_ed_tpu.metrics import get_metrics
    from vit_ed_tpu.metrics.wi19_sharded import merge_partials, row_partials

    sim = np.load(os.path.join(mp_outputs, "rank0_sim.npy"))
    parts, labels = [], np.arange(len(sim)) // 3
    for rank in range(2):
        rows = np.load(os.path.join(mp_outputs, f"rank{rank}_rows.npy"))
        lo, hi = np.load(os.path.join(mp_outputs, f"rank{rank}_rowrange.npy"))
        np.testing.assert_array_equal(rows, sim[lo:hi])
        parts.append(row_partials(1 - rows[..., 0].astype(np.float32), labels,
                                  row_labels=labels[lo:hi]))
    ref = get_metrics(1 - sim[..., 0].astype(np.float32), labels)
    np.testing.assert_allclose(merge_partials(parts), ref, rtol=1e-12)


def test_preempt_one_rank_sigterm_agrees_and_resumes(tmp_path):
    """SIGTERM exactly ONE rank of a 2-process training run: the
    PreemptionGuard's collective agreement must make BOTH ranks save the
    same checkpoint at the same optimizer step and exit 0; a restart in
    the same OUTPUT must auto-resume, continue the interrupted epoch from
    the exact step, and finish with bit-identical params on both ranks
    (utils/preempt.py's multi-host design claim, exercised for real)."""
    import json
    import signal as _signal
    import time

    from PIL import Image

    outdir = str(tmp_path / "preempt")
    data = os.path.join(outdir, "data")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = os.path.join(data, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(16 if sub.endswith("train_HR") else 4):
            arr = rng.integers(0, 255, size=(220, 220, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))
    with open(os.path.join(outdir, "cfg.yaml"), "w") as f:
        f.write("""
MODEL:
  TYPE: pjs
  NAME: tiny_mp_preempt
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
    C_DEPTH: 1
DATA:
  DATASET: div2k
  IMG_SIZE: 64
  BATCH_SIZE: 2
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 8
  WARMUP_EPOCHS: 0
SAVE_FREQ: 100
PRINT_FREQ: 1
""")

    def run_pair(extra_env=None):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env.update({
                "JAX_PLATFORMS": "cpu",
                "WORLD_SIZE": "2",
                "RANK": str(rank),
                "MASTER_ADDR": "localhost",
                "MASTER_PORT": str(port),
                "MP_LOCAL_DEVICES": "2",
                "MP_PREEMPT_TRAIN": "1",
                "PYTHONPATH": _REPO,
            })
            env.update(extra_env or {})
            procs.append(subprocess.Popen(
                [sys.executable, _WORKER, outdir], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        return procs

    def read_results(procs, timeout=600):
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
        for rank, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        results = []
        for rank in range(2):
            with open(os.path.join(outdir, f"preempt_rank{rank}.json")) as f:
                results.append(json.load(f))
        return results

    # ---- 1. run + SIGTERM exactly rank 1 after the first optimizer step
    procs = run_pair()
    markers = [os.path.join(outdir, f"trainstep_rank{r}") for r in range(2)]
    deadline = time.time() + 300
    while not all(os.path.exists(m) for m in markers):
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate()[0] for p in procs]
            raise AssertionError(f"worker died before first step:\n"
                                 f"{outs[0][-2000:]}\n{outs[1][-2000:]}")
        assert time.time() < deadline, "no training step within 300s"
        time.sleep(0.1)
    procs[1].send_signal(_signal.SIGTERM)   # ONE rank only

    results = read_results(procs)
    # both ranks agreed: preempted, at the SAME optimizer step
    assert results[0]["preempted"] and results[1]["preempted"]
    assert results[0]["step"] == results[1]["step"] >= 1
    saved_step = results[0]["step"]
    total = results[0]["steps_per_epoch"] * results[0]["epochs"]
    assert saved_step < total, "preemption landed after training finished"
    # the collective checkpoint exists and both ranks hold identical params
    ckpt_dir = os.path.join(outdir, "out", "tiny_mp_preempt", "mp",
                            "checkpoint.ckpt")
    assert os.path.isdir(ckpt_dir)
    leaf0 = np.load(os.path.join(outdir, "preempt_rank0_leaf.npy"))
    leaf1 = np.load(os.path.join(outdir, "preempt_rank1_leaf.npy"))
    np.testing.assert_array_equal(leaf0, leaf1)

    # ---- 2. restart: auto-resume continues the epoch from the exact step
    for r in range(2):
        os.remove(markers[r])
        os.remove(os.path.join(outdir, f"preempt_rank{r}_ok"))
    procs = run_pair()
    results2 = read_results(procs)
    for r in range(2):
        assert not results2[r]["preempted"]
        spe = results2[r]["steps_per_epoch"]
        assert results2[r]["skip"] == saved_step - results2[r]["start_epoch"] * spe
        assert results2[r]["step"] == total   # exact-step: no drift
    final0 = np.load(os.path.join(outdir, "preempt_rank0_leaf.npy"))
    final1 = np.load(os.path.join(outdir, "preempt_rank1_leaf.npy"))
    np.testing.assert_array_equal(final0, final1)
    assert not np.array_equal(final0, leaf0)   # training actually continued


def test_midscan_crash_restart_resumes_identically(tmp_path):
    """Kill rank 1 mid-scan (after its first row blocks are cached as npz),
    restart the whole 2-process job, and assert the resumed run's matrix
    equals an uninterrupted run's — the reference's crash-resume story
    (/root/reference/hisfrag.py:179-195, 260-276) without the
    shared-filesystem polling."""

    def run_pair(outdir, crash_rank=None, crash_after=0):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env.update({
                "JAX_PLATFORMS": "cpu",
                "WORLD_SIZE": "2",
                "RANK": str(rank),
                "MASTER_ADDR": "localhost",
                "MASTER_PORT": str(port),
                "MP_LOCAL_DEVICES": "2",
                "MP_SCAN_ONLY": "1",
                "PYTHONPATH": _REPO,
            })
            if crash_rank == rank:
                env["MP_CRASH_AFTER"] = str(crash_after)
            procs.append(subprocess.Popen(
                [sys.executable, _WORKER, outdir], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        return procs

    # 1. crashing run: rank 1 dies after 8 image loads (past its first row
    #    block); rank 0 then hangs at the allgather -> terminate it (a real
    #    crash takes down the whole job)
    crash_dir = str(tmp_path / "crash")
    os.makedirs(crash_dir)
    procs = run_pair(crash_dir, crash_rank=1, crash_after=8)
    out1 = procs[1].communicate(timeout=600)[0]
    assert procs[1].returncode == 17, f"rank1 did not crash as injected:\n{out1[-2000:]}"
    try:
        procs[0].communicate(timeout=30)
    except subprocess.TimeoutExpired:
        procs[0].terminate()
        procs[0].communicate(timeout=60)
    # some npz blocks must exist from before the crash
    import glob as _glob
    cached = _glob.glob(os.path.join(crash_dir, "resume_rank*_rows*.npz"))
    assert cached, "crash happened before any block was cached"

    # 2. restart: both ranks resume; must complete green
    procs = run_pair(crash_dir)
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"restarted rank {rank} failed:\n{out[-3000:]}"

    # 3. uninterrupted reference run in a fresh dir
    clean_dir = str(tmp_path / "clean")
    os.makedirs(clean_dir)
    procs = run_pair(clean_dir)
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"clean rank {rank} failed:\n{out[-3000:]}"

    for rank in range(2):
        resumed = np.load(os.path.join(crash_dir, f"scan_rank{rank}_sim.npy"))
        clean = np.load(os.path.join(clean_dir, f"scan_rank{rank}_sim.npy"))
        np.testing.assert_array_equal(resumed, clean)
