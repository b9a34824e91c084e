"""SimSiam (BatchNorm) model types through the Trainer entry surface.

The reference trains its SimSiam baselines through the same Trainer template
with SyncBatchNorm wrapping (/root/reference/models/build.py:53-91,
/root/reference/misc/engine.py:189-257). Here the engine must derive
``has_batch_stats`` from the init variables, thread the running stats through
``train()``, checkpoint them, and restore them on resume.
"""

import os

import numpy as np
import pytest
from PIL import Image


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
    eval_n_items_per_category = 5
    distance_reduction = "min"
    optim = None
    throughput = None


SS_CFG = """
MODEL:
  TYPE: ss2
  NAME: tiny_ss2
  NUM_CLASSES: 0
  SS:
    ARCH: resnet18
    EMBED_DIM: 32
    PRED_DIM: 16
DATA:
  DATASET: hisfrag20
  IMG_SIZE: 64
  BATCH_SIZE: 1
  TEST_BATCH_SIZE: 8
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 1
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


def _make_trainer(tmp_path, resume=None):
    from hisfrag_vit import HisfragVitTrainer
    from vit_ed_tpu.train.losses import negative_cosine_similarity

    class SS2Trainer(HisfragVitTrainer):
        """Single-view SimSiam on fragment crops; BatchNorm model type."""

        def make_loss_fn(self, criterion):
            def loss_fn(model, params, batch, rng, batch_stats):
                (p1, z1), mutated = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["samples"], train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return (negative_cosine_similarity(p1, z1),
                        mutated["batch_stats"])

            return loss_fn

        def validate(self):
            import jax
            import jax.numpy as jnp

            fwd = jax.jit(lambda v, x: self.model.apply(v, x))
            for images, _ in self.get_dataloader("val"):
                p1, z1 = fwd(self.model_variables(),
                             jnp.asarray(images, jnp.float32))
                return float(negative_cosine_similarity(
                    jnp.asarray(p1, jnp.float32), jnp.asarray(z1, jnp.float32)))
            return 0.0

    data = tmp_path / "hf"
    if not data.exists():
        os.makedirs(data)
        _write_hisfrag(str(data))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(SS_CFG)
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    args.resume = resume
    return SS2Trainer(args)


def test_ss2_trainer_threads_batch_stats(tmp_path):
    import jax

    trainer = _make_trainer(tmp_path)
    assert trainer.batch_stats is not None
    init_leaf = np.asarray(jax.tree.leaves(trainer.batch_stats)[0]).copy()

    state = trainer.train()
    assert int(state.step) > 0
    assert state.batch_stats is not None
    new_leaf = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    assert not np.allclose(init_leaf, new_leaf), \
        "BatchNorm running stats did not update through Trainer.train()"
    # trainer-level copy follows the state (used by model_variables/validate)
    assert "batch_stats" in trainer.model_variables()

    # checkpoint carries the running stats and the resume path restores them
    ckpt_dir = os.path.join(trainer.config.OUTPUT, "checkpoint.ckpt")
    assert os.path.isdir(ckpt_dir)
    resumed = _make_trainer(tmp_path, resume=ckpt_dir)
    resumed.config.defrost()
    resumed.config.MODEL.RESUME = ckpt_dir
    resumed.config.freeze()
    from vit_ed_tpu.train.engine import TrainState
    from vit_ed_tpu.train.optim import build_optimizer, build_schedule

    schedule = build_schedule(resumed.config, 10)
    tx = build_optimizer(resumed.config, schedule, resumed.params)
    import jax.numpy as jnp

    blank = TrainState(params=resumed.params, opt_state=tx.init(resumed.params),
                       step=jnp.zeros((), jnp.int32),
                       batch_stats=resumed.batch_stats)
    restored, _, _ = resumed._load_resume(blank)
    restored_leaf = np.asarray(jax.tree.leaves(restored.batch_stats)[0])
    np.testing.assert_allclose(restored_leaf, new_leaf, rtol=1e-6)
