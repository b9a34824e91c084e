"""Composed parallelisms (parallel/compose.py): Megatron TP + expert
parallelism + ZeRO-3 FSDP stacked per leaf on one mesh — spec layout,
train-step numerics vs plain replicated DP, and the config surface
with all three TPU flags on."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from PIL import Image

from vit_ed_tpu.parallel.compose import (
    composed_param_specs,
    shard_params_composed,
)
from vit_ed_tpu.parallel.mesh import create_mesh, replicated_sharding


def _tiny_moe_params():
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
                  depth=2, c_depth=2, num_heads=2, use_pallas=False,
                  moe_experts=2, moe_interval=2)
    x = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    host = jax.device_get(
        jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"])
    return model, host


def test_composed_specs_stack_disjoint_rules():
    _model, host = _tiny_moe_params()
    specs = composed_param_specs(host, tp=True, ep=True, fsdp=True,
                                 data_axis_size=2)
    # TP: attention + dense-MLP kernels
    assert specs["blocks_0"]["attn"]["qkv"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", None)
    # EP: the expert bank of the MoE block
    assert specs["blocks_1"]["mlp"]["w1"] == P("expert", None, None)
    # FSDP fallback: big leaves neither rule touched (patch conv kernel)
    pe = specs["patch_embed"]["proj"]["kernel"]
    assert "data" in pe
    # small leaves stay replicated
    assert specs["norm"]["scale"] == P()


def test_composed_train_step_matches_replicated():
    """Two donated train steps under TP+EP+FSDP on a (2,2,2) mesh equal
    plain replicated DP, and every rule's sharding survives the update."""
    import optax

    from vit_ed_tpu.config import default_config
    from vit_ed_tpu.train.engine import TrainState, make_train_step
    from vit_ed_tpu.train.losses import bce_with_logits
    from vit_ed_tpu.train.optim import build_optimizer, cosine_schedule

    model, host = _tiny_moe_params()
    mesh = create_mesh((2, 2, 2), axis_names=("data", "model", "expert"))
    cfg = default_config()
    schedule = cosine_schedule(1e-3, 1e-5, 1e-6, 100, 10)

    rng = np.random.default_rng(0)
    batch = {
        "samples": jax.device_put(
            np.asarray(rng.normal(size=(1, 8, 2, 32, 32, 3)), np.float32),
            NamedSharding(mesh, P(None, "data"))),
        "targets": jax.device_put(
            np.asarray(rng.random(size=(1, 8, 4)) > 0.5, np.float32),
            NamedSharding(mesh, P(None, "data"))),
    }

    # the "composed_sp" variant adds sequence-parallel activation
    # sharding on top: the MoE dispatch cumsum then runs over a
    # token-SHARDED stream and must stay exact
    sp_model = model.clone(act_sharding=NamedSharding(
        mesh, P("data", "model", None)))
    results = {}
    for name, mdl, placer in [
        ("dp", model, lambda p: jax.tree.map(
            lambda a: jax.device_put(a, replicated_sharding(mesh)), p)),
        ("composed", model, lambda p: shard_params_composed(
            p, mesh, tp=True, ep=True, fsdp=True, min_size=256)),
        ("composed_sp", sp_model, lambda p: shard_params_composed(
            p, mesh, tp=True, ep=True, fsdp=True, min_size=256)),
    ]:
        params = placer(host)
        tx = build_optimizer(cfg, schedule, params)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(mdl, tx, bce_with_logits, accum_steps=1,
                               moe_aux_weight=0.01)
        for _ in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
        results[name] = (jax.device_get(state.params),
                         float(metrics["loss"]), state)

    dp_params, dp_loss, _ = results["dp"]
    co_params, co_loss, co_state = results["composed"]
    assert np.isfinite(dp_loss) and abs(dp_loss - co_loss) < 1e-5
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=3e-6),
                 dp_params, co_params)
    sp_params, sp_loss, _ = results["composed_sp"]
    assert abs(dp_loss - sp_loss) < 1e-5
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=3e-6),
                 dp_params, sp_params)

    qkv = co_state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in qkv.sharding.spec
    w1 = co_state.params["blocks_1"]["mlp"]["w1"]
    assert w1.sharding.spec[0] == "expert"
    pe = co_state.params["patch_embed"]["proj"]["kernel"]
    assert "data" in pe.sharding.spec


CFG = """
MODEL:
  TYPE: pjs
  NAME: tiny_hybrid
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 4
    DEPTH: 2
    C_DEPTH: 2
    MOE:
      EXPERTS: 2
      INTERVAL: 2
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
  MESH_SHAPE: [2, 2, 2]
  MESH_AXES: [data, model, expert]
  TENSOR_PARALLEL: true
  SEQ_PARALLEL: true
  EXPERT_PARALLEL: true
  FSDP: true
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


def test_hybrid_train_from_config(tmp_path):
    from main import DefaultTrainer

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = data / sub
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 255, size=(220, 220, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"{i:04d}.png"))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG)

    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    trainer = DefaultTrainer(args)
    assert trainer.mesh.shape == {"data": 2, "model": 2, "expert": 2}
    assert trainer.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec \
        == P(None, "model")
    assert trainer.params["blocks_1"]["mlp"]["w1"].sharding.spec[0] == "expert"

    state = trainer.train()
    assert int(state.step) > 0
    assert np.isfinite(trainer.min_loss)
    out = os.path.join(args.output, "tiny_hybrid", "test")
    assert any(f.endswith(".ckpt") for f in os.listdir(out))
