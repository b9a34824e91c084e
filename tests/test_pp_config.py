"""TPU.PIPELINE_STAGES through the unmodified CLI surface: the trainer
builds the [data, stage] mesh from the config, holds the TrainState in the
stage-sharded PP layout, trains with the GPipe train step, and its loss
trajectory EQUALS the plain-DP trainer's from identical init and batches
(the pipeline is a reordering of the same math, parallel/pp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P


def _cfg(extra_tpu=""):
    return f"""
MODEL:
  TYPE: pjs
  NAME: tiny_pp
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 4
    DEPTH: 4
    C_DEPTH: 4
DATA:
  DATASET: div2k
  IMG_SIZE: 64
  BATCH_SIZE: 2
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
  BASE_LR: 0.002
  WEIGHT_DECAY: 0.05
SAVE_FREQ: 1
PRINT_FREQ: 1
SEED: 0
{extra_tpu}
"""


PP_TPU = """TPU:
  MESH_SHAPE: [2, 4]
  MESH_AXES: [data, stage]
  PIPELINE_STAGES: 4
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


class _ListLoader:
    def __init__(self, batches):
        self._batches = batches

    def __iter__(self):
        return iter(self._batches)

    def __len__(self):
        return len(self._batches)


def _make_batches(n=4, batch=16, img=64, ncls=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        samples = rng.normal(size=(batch, 2, img, img, 3)).astype(np.float32)
        targets = (rng.random((batch, ncls)) > 0.5).astype(np.float32)
        out.append((samples, targets))
    return out


def _run(tmp_path, cfg_text, batches, tag):
    from main import DefaultTrainer

    cfg = tmp_path / f"{tag}.yaml"
    cfg.write_text(cfg_text)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(tmp_path)  # unused: the loader is overridden
    args.output = str(tmp_path / tag)
    args.tag = tag

    losses = []

    class PPTrajTrainer(DefaultTrainer):
        def get_dataloader(self, mode):
            return _ListLoader(batches if mode == "train" else [])

        def validate(self):
            return 0.0

        def _aot_step(self, state, batch, rng):
            state, metrics = super()._aot_step(state, batch, rng)
            losses.append(float(jax.device_get(metrics["loss"])))
            return state, metrics

    trainer = PPTrajTrainer(args)
    state = trainer.train()
    return losses, trainer, state


def test_pp_train_matches_dp(tmp_path):
    batches = _make_batches()

    # plain DP over all 8 devices
    dp_losses, dp_trainer, _ = _run(tmp_path, _cfg(), batches, "dp")
    # PP: 2-way DP x 4-stage GPipe from the unmodified CLI surface
    pp_losses, pp_trainer, pp_state = _run(tmp_path, _cfg(PP_TPU), batches,
                                           "pp")

    assert pp_trainer.mesh.shape == {"data": 2, "stage": 4}
    # the TrainState lives stage-sharded in the stacked layout ...
    stacked = pp_state.params["blocks_stacked"]["attn"]["qkv"]["kernel"]
    assert stacked.shape[0] == 4
    assert stacked.sharding.spec == P("stage")
    assert "cross_blocks_stacked" in pp_state.params
    # ... while the eval-facing view is the standard tree
    assert "blocks_0" in pp_trainer.params
    assert pp_trainer.params["blocks_0"]["attn"]["qkv"]["kernel"].ndim == 2

    # identical math: the pipeline only reorders the sequential stack
    assert len(dp_losses) == len(pp_losses) == len(batches)
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-5, atol=1e-6)

    # the updated weights agree too (optimizer ran on the stacked layout)
    a = np.asarray(jax.device_get(
        pp_trainer.params["blocks_1"]["attn"]["qkv"]["kernel"]))
    b = np.asarray(jax.device_get(
        dp_trainer.params["blocks_1"]["attn"]["qkv"]["kernel"]))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    # and training moved them off init
    assert float(np.abs(a).sum()) > 0 and dp_losses[0] != dp_losses[-1]


def test_pp_weight_decay_mask_matches_sequential(tmp_path):
    """The wd mask over the stacked layout must select exactly the leaves
    the sequential mask selects (a stacked LayerNorm scale is 2-D but
    still a per-layer 1-D no-decay param)."""
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.parallel.pp import pp_transform_params
    from vit_ed_tpu.train.optim import weight_decay_mask

    model = ViTED(img_size=64, patch_size=32, num_classes=4, embed_dim=32,
                  depth=2, c_depth=2, num_heads=4, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 64, 64, 3)))["params"]
    seq_mask = weight_decay_mask(params)
    pp_mask = weight_decay_mask(pp_transform_params(params, 2, 2))
    # stacked mask for layer 0 must equal the sequential mask of blocks_0
    assert (pp_mask["blocks_stacked"]["norm1"]["scale"]
            == seq_mask["blocks_0"]["norm1"]["scale"] is False)
    assert (pp_mask["blocks_stacked"]["attn"]["qkv"]["kernel"]
            == seq_mask["blocks_0"]["attn"]["qkv"]["kernel"] is True)
    assert (pp_mask["cross_blocks_stacked"]["mlp"]["fc1"]["bias"]
            == seq_mask["cross_blocks_0"]["mlp"]["fc1"]["bias"] is False)
    # every stacked leaf's mask equals the per-layer sequential mask
    jax.tree.map(lambda a, b: (_ for _ in ()).throw(
        AssertionError("stacked wd mask diverges")) if a != b else None,
        pp_mask["blocks_stacked"], seq_mask["blocks_0"])
    jax.tree.map(lambda a, b: (_ for _ in ()).throw(
        AssertionError("stacked wd mask diverges")) if a != b else None,
        pp_mask["cross_blocks_stacked"], seq_mask["cross_blocks_0"])


def test_pp_config_validation(tmp_path):
    from main import DefaultTrainer

    bad = _cfg("""TPU:
  MESH_SHAPE: [2, 4]
  MESH_AXES: [data, stage]
  PIPELINE_STAGES: 3
""")
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(bad)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(tmp_path)
    args.output = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="stage"):
        DefaultTrainer(args)

    droppy = _cfg(PP_TPU).replace("DROP_PATH_RATE: 0.0",
                                  "DROP_PATH_RATE: 0.1")
    cfg2 = tmp_path / "bad2.yaml"
    cfg2.write_text(droppy)
    args2 = Args()
    args2.cfg = str(cfg2)
    args2.data_path = str(tmp_path)
    args2.output = str(tmp_path / "bad2")
    with pytest.raises(ValueError, match="DROP_PATH_RATE"):
        DefaultTrainer(args2)
