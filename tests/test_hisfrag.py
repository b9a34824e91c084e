"""End-to-end HisFrag pipeline on synthetic writer data: the mined-pair
train step and the sharded O(N^2) eval -> wi19 mAP (the equivalence
contract of reference tests/hisfrag_evaluation_test.py)."""

import os

import numpy as np
import pytest
from PIL import Image


def _write_hisfrag(root, n_writers=6, pages=1, frags=3, size=80):
    rng = np.random.default_rng(0)
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    for w in range(n_writers):
        base = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        for p in range(pages):
            for f in range(frags):
                # writer-correlated texture: same base + small noise
                arr = np.clip(base + rng.integers(-20, 20, base.shape), 0, 255)
                Image.fromarray(arr.astype(np.uint8)).save(
                    os.path.join(d, f"w{w:03d}_{p}_{f}.jpg"))


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
    eval_n_items_per_category = 5
    distance_reduction = "min"


@pytest.fixture(scope="module")
def hisfrag_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hisfrag")
    data = tmp / "data"
    _write_hisfrag(str(data))
    cfg = tmp / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_hisfrag
  NUM_CLASSES: 1
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
    C_DEPTH: 1
DATA:
  DATASET: hisfrag20
  IMG_SIZE: 64
  BATCH_SIZE: 1
  TEST_BATCH_SIZE: 8
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 5
""")
    return tmp, data, cfg


def test_hisfrag_dataset_split(hisfrag_env):
    from vit_ed_tpu.data.hisfrag import HisFrag20, Split

    _tmp, data, _cfg = hisfrag_env
    ds = HisFrag20(str(data), Split.TRAIN)
    # 93% of 6 writers -> 5 writers, 3 frags each
    assert len(ds.writers) == 5
    assert len(ds) == 15
    ds_val = HisFrag20(str(data), Split.VAL)
    assert len(ds_val.writers) == 1


def test_pair_mining(hisfrag_env):
    """prepare_data semantics (hisfrag.py:117-148): positives are same-label
    upper-triangle pairs; negatives capped at 2x; padded buffer masked."""
    from hisfrag import HisfragTrainer

    tmp, data, cfg = hisfrag_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_mine")
    trainer = HisfragTrainer(args)

    samples = np.zeros((6, 64, 64, 3), np.float32)
    targets = np.asarray([0, 0, 0, 1, 1, 1])
    batch = trainer.prepare_data(samples, targets)
    mask = batch["pair_mask"].astype(bool)
    gi, gj = batch["gi"][mask], batch["gj"][mask]
    t = batch["pair_targets"][mask][:, 0]
    labels = targets
    # every positive pair has equal labels, negative unequal
    for a, b, y in zip(gi, gj, t):
        assert (labels[a] == labels[b]) == bool(y)
    n_pos = int(t.sum())
    n_neg = int((1 - t).sum())
    assert n_pos == 6  # 2 classes x C(3,2)
    assert n_neg <= 2 * n_pos


def test_hisfrag_train_and_validate(hisfrag_env):
    from hisfrag import HisfragTrainer

    tmp, data, cfg = hisfrag_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_train")
    trainer = HisfragTrainer(args)
    state = trainer.train()
    assert int(state.step) > 0
    # validate() ran inside train(); run it once more explicitly
    loss = trainer.validate()
    assert 0.0 <= loss <= 1.0  # 1 - mAP


def test_hisfrag_sharded_eval_metrics(hisfrag_env):
    """TPU.SHARDED_EVAL_METRICS test path (never assembles N x N) must
    report the same wi19 numbers as the assembled test path."""
    from hisfrag import HisfragTrainer
    from vit_ed_tpu.data.hisfrag import HisFrag20Test
    from vit_ed_tpu.metrics import get_metrics
    from vit_ed_tpu.utils.misc import list_to_idx

    tmp, data, cfg = hisfrag_env
    rng = np.random.default_rng(7)
    d = os.path.join(str(data), "test")
    os.makedirs(d, exist_ok=True)
    for w in range(5):
        base = rng.integers(0, 255, size=(80, 80, 3), dtype=np.uint8)
        for f in range(3):
            arr = np.clip(base + rng.integers(-20, 20, base.shape), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(d, f"tw{w:03d}_0_{f}.jpg"))

    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_sharded")
    args.mode = "test"
    trainer = HisfragTrainer(args)

    dm, names = trainer.validate_dataloader(HisFrag20Test.Split.TEST)
    labels = list_to_idx(names, lambda x: x.split("_")[0])
    ref = get_metrics(dm.astype(np.float32), np.asarray(labels))

    trainer.config.defrost()
    trainer.config.TPU.SHARDED_EVAL_METRICS = True
    trainer.config.freeze()
    m_ap = trainer.test()
    np.testing.assert_allclose(m_ap, 1 - (1 - ref[0]), rtol=1e-6)

    # TPU.EVAL_SLAB_ON_DISK: the row slab itself becomes a memmap under
    # OUTPUT (host RAM O(batch) at any N) — same numbers, bit for bit
    trainer.config.defrost()
    trainer.config.TPU.EVAL_SLAB_ON_DISK = True
    trainer.config.freeze()
    m_ap2 = trainer.test()
    assert m_ap2 == m_ap
    import glob

    assert glob.glob(os.path.join(trainer.config.OUTPUT, "*_rank0_slab.dat"))


def test_raw_image_respects_lower_bound(hisfrag_env):
    """raw_image (the native batch-prep entry) must index identically to
    __getitem__: with lower_bound=k, raw_image(i) is the pixels of the
    (i+k)-th sample, and __getitem__(i) returns index i+k."""
    from vit_ed_tpu.data.hisfrag import HisFrag20Test, Split

    _tmp, data, _cfg = hisfrag_env
    d = os.path.join(str(data), "train")
    samples = sorted(os.path.join(d, f) for f in os.listdir(d))[:5]
    ds = HisFrag20Test(str(data), Split.TEST, transform=None,
                       samples=samples, lower_bound=2)
    assert len(ds) == 3
    for i in range(len(ds)):
        img, idx = ds[i]
        assert int(idx) == i + 2
        np.testing.assert_array_equal(ds.raw_image(i),
                                      np.asarray(img, np.uint8))


def test_device_normalize_u8_wire_end_to_end(hisfrag_env):
    """TPU.DEVICE_NORMALIZE ships uint8 THROUGH the datasets: the train
    loader's batches, prepare_data's samples, and the eval transform all
    stay u8 so the model's on-device normalize gate fires (regression:
    the dataset __getitem__s used to cast the transform's u8 output to
    f32, silently feeding the model un-normalized 0-255 floats)."""
    from hisfrag import HisfragTrainer
    from vit_ed_tpu.data.hisfrag import HisFrag20, Split

    tmp, data, cfg = hisfrag_env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out_u8")
    args.opts = ["TPU.DEVICE_NORMALIZE", "True"]
    trainer = HisfragTrainer(args)

    transforms = trainer.get_transforms()
    ds = HisFrag20(str(data), Split.TRAIN, transform=transforms["train"])
    img, _label = ds[0]
    assert img.dtype == np.uint8

    samples, labels = next(iter(trainer.get_dataloader("train")))
    assert samples.dtype == np.uint8
    batch = trainer.prepare_data(samples, labels)
    assert batch["samples"].dtype == np.uint8

    # eval transform emits u8 and bypasses the pooled f32 prep
    out = transforms["val"](Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (80, 80, 3), np.uint8)))
    assert out.dtype == np.uint8
    assert transforms["val"].pool_crop((80, 80)) is None

    # end to end: the u8 trainer's validation loss equals the default
    # f32 trainer's (identical init seeds; the model normalizes on device)
    loss_u8 = trainer.validate()
    args_f32 = Args()
    args_f32.cfg = str(cfg)
    args_f32.data_path = str(data)
    args_f32.output = str(tmp / "out_u8_ref")
    trainer_f32 = HisfragTrainer(args_f32)
    loss_f32 = trainer_f32.validate()
    np.testing.assert_allclose(loss_u8, loss_f32, atol=1e-4)


def test_vit_trainer_prepare_data_preserves_u8():
    """HisfragVitTrainer.prepare_data rides the u8 device wire too."""
    from hisfrag_vit import HisfragVitTrainer

    u8 = np.zeros((2, 8, 8, 3), np.uint8)
    out = HisfragVitTrainer.prepare_data(None, u8, [0, 1])
    assert out["samples"].dtype == np.uint8
    out = HisfragVitTrainer.prepare_data(None, u8.astype(np.float64), [0, 1])
    assert out["samples"].dtype == np.float32
