"""Michigan trainer end-to-end on a synthetic papyrus tree."""

import os

import numpy as np
import pytest
from PIL import Image


def _tree(root, n_papyri=4, frags=3, size=80):
    rng = np.random.default_rng(0)
    for p in range(n_papyri):
        im_name = f"pap{p}"
        for f in range(frags):
            path = os.path.join(root, im_name, "front", "detail", f"{im_name}sub",
                                "papyrus", "x", f"f{f}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            arr = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(path)


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    geshaem_data_path = None
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
    eval_n_items_per_category = 5
    distance_reduction = "min"


@pytest.fixture(scope="module")
def michigan_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("michigan")
    data = tmp / "data"
    os.makedirs(data)
    _tree(str(data))
    cfg = tmp / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_michigan
  NUM_CLASSES: 1
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
    C_DEPTH: 1
DATA:
  DATASET: michigan
  IMG_SIZE: 64
  BATCH_SIZE: 1
  TEST_BATCH_SIZE: 8
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 20
""")
    return tmp, data, cfg


def test_michigan_train_epoch(michigan_env):
    from michigan import MichiganTrainer

    tmp, data, cfg = michigan_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")

    # validate() needs the sharded scan over MichiganTest; patch it out to
    # isolate the training path (eval path covered by test_pairs/test_hisfrag)
    MichiganTrainer.validate = lambda self: 0.5
    trainer = MichiganTrainer(args)
    state = trainer.train()
    assert int(state.step) > 0


def test_michigan_validate_scan(michigan_env):
    """The Michigan O(N^2) eval path over the synthetic tree."""
    from importlib import reload

    import michigan as michigan_mod

    reload(michigan_mod)  # undo the validate patch from the previous test

    tmp, data, cfg = michigan_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_eval")
    trainer = michigan_mod.MichiganTrainer(args)
    from vit_ed_tpu.data.michigan import MichiganTest

    dist, labels = trainer.validate_dataloader(MichiganTest.Split.VAL)
    n = len(labels)
    assert dist.shape == (n, n)
    assert np.isfinite(dist.astype(np.float32)).all()


def test_select_scans_keep_zero_keeps_none():
    """val_n_items_per_writer=0 truncates every papyrus's list to EMPTY
    (reference [:0] semantics) — 0 is not 'keep all'."""
    from vit_ed_tpu.data.michigan import _select_scans, PapyrusFile

    table = [
        PapyrusFile(path=f"p1_f{i}.jpg", papyrus="p1", side="front",
                    medium="papyrus", kind="detail", folder="f")
        for i in range(3)
    ]
    assert all(v == [] for v in _select_scans(table, 0).values())
    assert all(len(v) == 3 for v in _select_scans(table, None).values())
    assert all(len(v) == 2 for v in _select_scans(table, 2).values())


def test_one_img_eval_zoom_emit_u8(michigan_env):
    """OneImgEvalZoom(emit_u8=True) (the michigan/geshaem u8 wire):
    uint8 output whose device-normalized value equals the f32 chain;
    the pooled f32 prep is bypassed; MichiganTrainer wires it through
    TPU.DEVICE_NORMALIZE and the dataset preserves the dtype."""
    from PIL import Image

    from vit_ed_tpu.data.transforms import OneImgEvalZoom
    from vit_ed_tpu.data.michigan import MichiganDataset

    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 256, (90, 84, 3), np.uint8))
    f32 = OneImgEvalZoom(64)(img)
    u8 = OneImgEvalZoom(64, emit_u8=True)(img)
    assert u8.dtype == np.uint8 and u8.shape == (64, 64, 3)
    np.testing.assert_allclose(
        (u8.astype(np.float32) / 255.0 - 0.5) / 0.5, f32, atol=1e-6)
    assert OneImgEvalZoom(64, emit_u8=True).pool_crop((90, 84)) is None

    from michigan import MichiganTrainer

    tmp, data, cfg = michigan_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_u8")
    args.opts = ["TPU.DEVICE_NORMALIZE", "True"]
    trainer = MichiganTrainer(args)
    transforms = trainer.get_transforms()
    ds = MichiganDataset(str(data), MichiganDataset.Split.TRAIN,
                         transforms["train"])
    sample, _label = ds[0]
    assert sample.dtype == np.uint8
    assert transforms["validation"].emit_u8
