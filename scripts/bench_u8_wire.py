"""End-to-end A/B of the u8 device wire (TPU.DEVICE_NORMALIZE).

Runs the REAL flagship hisfrag train path (entry-point trainer, real
dataloader, synthetic ~700px JPEG fragments) twice — f32 host-normalize
vs uint8 device-normalize — and reports the warm-epoch step time of
each. This measures the whole wire: JPEG decode, augmentation, batch
collate, host->device transfer, device step.

The wire must ENGAGE to count: the script asserts the u8 run's loader
batches are uint8 end to end (regression guard for the round-4 bug
where the dataset __getitem__ cast the transform's u8 output to f32,
silently disabling the device normalize).

Usage: python scripts/bench_u8_wire.py [--batch 6] [--writers 20]
       [--frags 6] [--size 700] [--epochs 2]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np
from PIL import Image


def write_fragments(root: str, writers: int, frags: int, size: int) -> None:
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for w in range(writers):
        base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for f in range(frags):
            arr = np.clip(base + rng.integers(-25, 25, base.shape), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(d, f"w{w:03d}_0_{f}.jpg"), quality=92)


class _Args:
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
    tag = "bench"
    mode = "train"
    eval = None
    throughput = None
    optim = None
    keep_attn = None
    eval_n_items_per_category = 5
    distance_reduction = "min"


def run_one(data: str, out: str, batch: int, epochs: int, dev_norm: bool):
    from hisfrag import HisfragTrainer

    args = _Args()
    args.cfg = "configs/hisfrag/hisfrag20_patch16_512.yaml"
    args.data_path = data
    args.batch_size = batch
    args.output = out
    args.opts = ["TRAIN.EPOCHS", str(epochs), "TRAIN.WARMUP_EPOCHS", "0",
                 "PRINT_FREQ", "1000", "SAVE_FREQ", "1000",
                 "TPU.DEVICE_NORMALIZE", str(dev_norm)]

    epoch_secs = {}

    class BenchTrainer(HisfragTrainer):
        def validate(self):  # isolate the train path
            return 0.0

        def train_one_epoch(self, epoch, loader, state, criterion):
            t0 = time.time()
            state = super().train_one_epoch(epoch, loader, state, criterion)
            epoch_secs[epoch] = time.time() - t0
            return state

    trainer = BenchTrainer(args)
    # prove the wire engaged (or stayed off)
    samples, _ = next(iter(trainer.get_dataloader("train")))
    want = np.uint8 if dev_norm else np.float32
    assert samples.dtype == want, (samples.dtype, want)
    bytes_per_batch = samples.nbytes
    state = trainer.train()
    steps = int(np.asarray(state.step)) // epochs
    assert steps > 0, "no train steps ran — dataset too small for the batch"
    warm = epoch_secs[max(epoch_secs)]  # last epoch: no compile inside
    return warm / steps, steps, bytes_per_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--writers", type=int, default=20)
    ap.add_argument("--frags", type=int, default=6)
    ap.add_argument("--size", type=int, default=700)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    if args.epochs < 2:
        ap.error("--epochs must be >= 2: the first epoch includes XLA "
                 "compilation, so a 1-epoch run would skew the f32-vs-u8 A/B")

    tmp = tempfile.mkdtemp(prefix="u8wire_")
    data = os.path.join(tmp, "hisfrag")
    write_fragments(data, args.writers, args.frags, args.size)
    try:
        f32_step, steps, f32_bytes = run_one(
            data, os.path.join(tmp, "out_f32"), args.batch, args.epochs, False)
        print(f"f32 wire: {f32_step * 1e3:8.1f} ms/step "
              f"({steps} steps/epoch, {f32_bytes / 1e6:.1f} MB samples/batch)")
        u8_step, steps, u8_bytes = run_one(
            data, os.path.join(tmp, "out_u8"), args.batch, args.epochs, True)
        print(f"u8 wire:  {u8_step * 1e3:8.1f} ms/step "
              f"({steps} steps/epoch, {u8_bytes / 1e6:.1f} MB samples/batch)")
        print(f"speedup: {f32_step / u8_step:.3f}x  "
              f"(sample bytes {f32_bytes / u8_bytes:.1f}x smaller)")
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
