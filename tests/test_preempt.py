"""Preemption-tolerant training (utils/preempt.py + engine wiring).

The reference loses everything since the last SAVE_FREQ epoch on a SLURM
kill (/root/reference/misc/engine.py:167-177); here SIGTERM triggers one
agreed collective checkpoint and a clean exit, and auto-resume restarts
the interrupted epoch.
"""

import os
import signal

import numpy as np
import pytest
from PIL import Image


def _write_div2k(root, n=4, size=220):
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    pretrained = None
    resume = None
    accumulation_steps = None
    use_checkpoint = None
    disable_amp = True
    output = None
    tag = "test"
    mode = "train"
    eval = None
    throughput = None
    optim = None
    keep_attn = None
    eval_n_items_per_category = None


@pytest.fixture(scope="module")
def div2k_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("div2k_preempt")
    data = tmp / "data"
    _write_div2k(str(data))
    cfg = tmp / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_preempt
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
  EPOCHS: 3
  WARMUP_EPOCHS: 0
SAVE_FREQ: 100
PRINT_FREQ: 1
""")
    return tmp, data, cfg


def test_guard_real_sigterm_roundtrip():
    """A real SIGTERM must set the flag (not kill the process), agree via
    should_stop, and uninstall must restore the previous handler."""
    from vit_ed_tpu.utils.preempt import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard(check_freq=1).install()
    try:
        assert not guard.preempted_locally
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.preempted_locally
        assert guard.should_stop(0)
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_check_freq_cadence():
    """Off-cadence steps return False even when flagged, so the collective
    agreement stays aligned across processes."""
    from vit_ed_tpu.utils.preempt import PreemptionGuard

    guard = PreemptionGuard(check_freq=4)  # not installed: no handler needed
    guard.signal()
    assert [guard.should_stop(s) for s in range(1, 9)] == [
        False, False, False, True, False, False, False, True]


def test_preempted_training_saves_and_resumes(div2k_env):
    """Preemption mid-epoch-0 must checkpoint, exit the loop cleanly, and
    a fresh Trainer in the same OUTPUT must auto-resume and complete."""
    from main import DefaultTrainer

    tmp, data, cfg = div2k_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")

    class PreemptingTrainer(DefaultTrainer):
        """Trips the guard after the first optimizer step — the
        deterministic equivalent of SIGTERM arriving mid-epoch (the
        real-signal path is covered by the roundtrip test above)."""

        def _aot_step(self, *a):
            out = super()._aot_step(*a)
            self._preempt.signal()
            return out

    trainer = PreemptingTrainer(args)
    before = signal.getsignal(signal.SIGTERM)
    state = trainer.train()
    assert trainer.preempted
    assert int(state.step) == 1          # stopped right after step 1
    out_dir = os.path.join(args.output, "tiny_preempt", "test")
    assert os.path.isdir(os.path.join(out_dir, "checkpoint.ckpt"))
    # guard uninstalled on exit: the pre-train handler is back
    assert signal.getsignal(signal.SIGTERM) is before

    resumed = DefaultTrainer(args)
    assert resumed.config.MODEL.RESUME   # auto-resume found the checkpoint
    state2 = resumed.train()
    assert not resumed.preempted
    # exact-step resume: the interrupted epoch 0 is CONTINUED from optimizer
    # step 1 (not replayed), so the total update count equals an
    # uninterrupted run's — 2 steps/epoch x 3 epochs — and the LR schedule
    # sees exactly the same step sequence
    assert resumed.start_epoch == 0
    assert resumed._resume_skip_opt_steps == 1
    steps_per_epoch = len(resumed.get_dataloader("train"))
    epochs = resumed.config.TRAIN.EPOCHS
    assert int(state2.step) == steps_per_epoch * epochs
