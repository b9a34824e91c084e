"""End-to-end smoke tests for the remaining CLI entry trainers on
synthetic data (tiny configs, CPU mesh)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    puzzle_data_path = None
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
    numb_iter = 4
    start_lr = 1e-6
    end_lr = 1e-3


def _write_div2k(root, n=4, size=220):
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


VIT_CFG = """
MODEL:
  TYPE: vit
  NAME: tiny_vit_triplet
  NUM_CLASSES: 16
  DROP_PATH_RATE: 0.0
  VIT:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
DATA:
  DATASET: div2k_triplet
  IMG_SIZE: 64
  BATCH_SIZE: 1
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 10
"""


def test_main_vit_triplet_train(tmp_path):
    from main_vit import VitTripletTrainer

    data = tmp_path / "div2k"
    _write_div2k(str(data))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(VIT_CFG)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    trainer = VitTripletTrainer(args)
    state = trainer.train()
    assert int(state.step) > 0


def test_main_vit_puzzle_testing(tmp_path):
    """main_vit testing(): per-rotation embedding distances -> solver."""
    from main_vit import VitTripletTrainer

    data = tmp_path / "div2k"
    _write_div2k(str(data), n=2)
    puzzles = tmp_path / "puzzles" / "Cho"
    os.makedirs(puzzles)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (192, 192, 3), np.uint8)).save(
        str(puzzles / "p.jpg"))

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(VIT_CFG)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(tmp_path / "puzzles")
    args.output = str(tmp_path / "out2")
    trainer = VitTripletTrainer(args)
    os.chdir(str(tmp_path))  # testing() writes to ./output
    trainer.testing()


HISFRAG_VIT_CFG = """
MODEL:
  TYPE: vit
  NAME: tiny_hisfrag_vit
  NUM_CLASSES: 16
  DROP_PATH_RATE: 0.0
  VIT:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
DATA:
  DATASET: hisfrag20
  IMG_SIZE: 64
  BATCH_SIZE: 1
  TEST_BATCH_SIZE: 16
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 10
"""


def _write_hisfrag(root, n_writers=6, frags=3, size=70):
    rng = np.random.default_rng(0)
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    for w in range(n_writers):
        for f in range(frags):
            arr = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"w{w:03d}_0_{f}.jpg"))


def test_hisfrag_vit_train_and_validate(tmp_path):
    from hisfrag_vit import HisfragVitTrainer

    data = tmp_path / "hf"
    os.makedirs(data)
    _write_hisfrag(str(data))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(HISFRAG_VIT_CFG)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    trainer = HisfragVitTrainer(args)
    state = trainer.train()
    assert int(state.step) > 0
    loss = trainer.validate()
    assert 0.0 <= loss <= 1.0


def test_pajigsaw_trainer(tmp_path):
    from pajigsaw import PajigsawTrainer

    root = tmp_path / "pjs"
    os.makedirs(root)
    rng = np.random.default_rng(0)
    fragments = []
    for r in range(3):
        for c in range(4):
            rel = f"img0/{r}_{c}.jpg"
            os.makedirs(os.path.dirname(root / rel), exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
                str(root / rel))
            fragments.append({"im_path": rel, "row": r, "col": c, "degree": 0,
                              "white_percentage": 0.0})
    manifest = {"img0": {"Fragment1v1Rotate90": fragments}}
    for split in ("train", "val", "test"):
        with open(root / f"{split}.json", "w") as f:
            json.dump(manifest, f)

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_pajigsaw
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 16
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
    C_DEPTH: 1
DATA:
  DATASET: pajigsaw
  IMG_SIZE: 64
  BATCH_SIZE: 1
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 10
""")
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(root)
    args.output = str(tmp_path / "out")
    trainer = PajigsawTrainer(args)
    # puzzle-solving validation runs inside train()
    state = trainer.train()
    assert int(state.step) > 0


def test_lr_finder(tmp_path):
    from lr_finder import LrFinderTrainer

    data = tmp_path / "div2k"
    _write_div2k(str(data))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("""
MODEL:
  TYPE: pjs
  NAME: tiny_lrfind
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
  BATCH_SIZE: 1
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
""")
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    trainer = LrFinderTrainer(args)
    os.chdir(str(tmp_path))
    suggestion = trainer.find_lr(num_iter=4, start_lr=1e-6, end_lr=1e-3)
    assert 1e-7 < suggestion < 1e-2
