"""Config-surface parallelism (TPU.TENSOR_PARALLEL / SEQ_PARALLEL /
RING_ATTN): the trainer must build the 2-D mesh from the config, shard
params Megatron-style, train + validate + checkpoint + resume — the
whole reference CLI surface, no Python API required."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from PIL import Image

CFG = """
MODEL:
  TYPE: pjs
  NAME: tiny_tp
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 4
    DEPTH: 2
    C_DEPTH: 2
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
TPU:
  MESH_SHAPE: [2, 4]
  TENSOR_PARALLEL: true
  SEQ_PARALLEL: true
  RING_ATTN: true
"""


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
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tp_train")
    data = tmp / "data"
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = data / sub
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 255, size=(220, 220, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"{i:04d}.png"))
    cfg = tmp / "cfg.yaml"
    cfg.write_text(CFG)
    return tmp, data, cfg


def test_tp_sp_ring_train_from_config(env):
    from main import DefaultTrainer

    tmp, data, cfg = env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")

    trainer = DefaultTrainer(args)
    assert trainer.mesh.shape == {"data": 2, "model": 4}
    assert trainer.model.ring_attn
    qkv = trainer.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")

    state = trainer.train()
    assert int(state.step) > 0
    assert np.isfinite(trainer.min_loss)
    # sharding survives the donated train step
    assert state.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec \
        == P(None, "model")
    out = os.path.join(args.output, "tiny_tp", "test")
    assert any(f.endswith(".ckpt") for f in os.listdir(out))


def test_tp_resume_restores_sharded(env):
    """Auto-resume restores the checkpoint INTO the TP shardings (orbax
    abstract-state restore) and continues."""
    from main import DefaultTrainer

    tmp, data, cfg = env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")

    trainer = DefaultTrainer(args)
    assert trainer.config.MODEL.RESUME
    state = trainer.train()
    assert trainer.start_epoch == 1
    assert int(state.step) > 0
    assert state.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec \
        == P(None, "model")


def test_ring_attn_without_seq_parallel_rejected(env, tmp_path):
    from main import DefaultTrainer

    _tmp, data, _cfg = env
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(CFG.replace("SEQ_PARALLEL: true", "SEQ_PARALLEL: false"))
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    with pytest.raises(ValueError, match="RING_ATTN"):
        DefaultTrainer(args)


def test_tp_without_model_axis_rejected(env, tmp_path):
    from main import DefaultTrainer

    _tmp, data, _cfg = env
    cfg = tmp_path / "bad2.yaml"
    cfg.write_text(CFG.replace("MESH_SHAPE: [2, 4]", "MESH_SHAPE: []"))
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    with pytest.raises(ValueError, match="model"):
        DefaultTrainer(args)


def test_tp_pretrained_load_keeps_sharding(env, tmp_path):
    """MODEL.PRETRAINED merges host arrays into the param tree; under
    TENSOR_PARALLEL the trainer must re-establish the Megatron shardings
    afterwards."""
    from main import DefaultTrainer

    tmp, data, cfg = env
    ckpt_dir = os.path.join(str(tmp / "out"), "tiny_tp", "test")
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")]
    assert ckpts  # produced by test_tp_sp_ring_train_from_config

    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out_pre")
    args.pretrained = os.path.join(ckpt_dir, ckpts[0])
    trainer = DefaultTrainer(args)
    qkv = trainer.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    fc2 = trainer.params["blocks_0"]["mlp"]["fc2"]["kernel"]
    assert fc2.sharding.spec == P("model", None)
