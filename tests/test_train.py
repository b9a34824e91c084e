"""End-to-end training smoke tests with tiny configs and synthetic data
(SURVEY.md §4: tiny-config end-to-end runs)."""

import os

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
    tmp = tmp_path_factory.mktemp("div2k")
    data = tmp / "data"
    _write_div2k(str(data))
    cfg = tmp / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_div2k
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
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 1
PRINT_FREQ: 1
""")
    return tmp, data, cfg


def test_div2k_dataset(div2k_env):
    from vit_ed_tpu.data.div2k import DIV2KPatch, Split
    from vit_ed_tpu.data.transforms import TwoImgSyncEval

    _tmp, data, _cfg = div2k_env
    ds = DIV2KPatch(str(data), Split.TRAIN, transform=TwoImgSyncEval(64),
                    image_size=64, erosion_ratio=0.07, with_negative=True)
    assert len(ds) == 4
    stacked, label = ds[0]
    assert stacked.shape == (2, 64, 64, 3)
    assert label.shape == (4,)
    assert stacked.min() >= -1.0 - 1e-6 and stacked.max() <= 1.0 + 1e-6


def test_div2k_label_distribution(div2k_env):
    """Label semantics (div2k_patch.py:131-153): with_negative -> ~30% all
    zero; positives one-hot across 4 bins."""
    from vit_ed_tpu.data.div2k import DIV2KPatch, Split

    _tmp, data, _cfg = div2k_env
    ds = DIV2KPatch(str(data), Split.TRAIN, transform=None, image_size=64,
                    erosion_ratio=0.07, with_negative=True)
    import random

    random.seed(0)
    labels = [tuple(ds[i % len(ds)][1].tolist()) for i in range(200)]
    negs = sum(1 for l in labels if sum(l) == 0)
    assert 0.15 < negs / len(labels) < 0.45
    for l in labels:
        assert sum(l) in (0.0, 1.0)
    # all four direction bins should occur
    seen = set(l.index(1.0) for l in labels if sum(l) == 1.0)
    assert seen == {0, 1, 2, 3}


def test_train_end_to_end(div2k_env, monkeypatch):
    """One epoch of DIV2K training must run, validate, and checkpoint."""
    from main import DefaultTrainer

    tmp, data, cfg = div2k_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")
    state = DefaultTrainer(args).train()
    assert np.isfinite(float(np.asarray(state.step)))
    assert int(state.step) > 0
    ckpts = [f for f in os.listdir(os.path.join(args.output, "tiny_div2k", "test"))
             if f.endswith(".ckpt")]
    assert ckpts


def test_auto_resume(div2k_env):
    """Second Trainer in the same OUTPUT must auto-resume from the newest
    checkpoint (misc/utils.py:170-180 semantics) and restore the full
    train state through orbax."""
    from main import DefaultTrainer

    tmp, data, cfg = div2k_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")
    trainer = DefaultTrainer(args)
    assert trainer.config.MODEL.RESUME  # picked up the checkpoint
    state = trainer.train()             # restores; START_EPOCH==EPOCHS -> no new epochs
    assert trainer.start_epoch == 1
    assert int(state.step) > 0          # optimizer step counter restored


def test_remat_model_gradients():
    """TRAIN.USE_CHECKPOINT maps to nn.remat; gradients must flow."""
    import jax
    import jax.numpy as jnp

    from vit_ed_tpu.models.vit_ed import ViTED

    m = ViTED(img_size=64, patch_size=32, num_classes=4, embed_dim=16,
              depth=1, c_depth=1, num_heads=2, use_pallas=False, remat=True)
    x = jnp.ones((2, 2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
