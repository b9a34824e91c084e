"""BatchNorm-model training through the engine: batch_stats threading for
the SimSiam/ResNet baselines (SyncBatchNorm equivalent under jit-over-mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_ed_tpu.models.resnet import ResNetWrapper
from vit_ed_tpu.models.simsiam import SimSiamV2
from vit_ed_tpu.train.engine import TrainState, make_train_step
from vit_ed_tpu.train.losses import negative_cosine_similarity


def test_resnet_embedding_train_step():
    model = ResNetWrapper(backbone="resnet18")
    x = jnp.zeros((4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.sgd(1e-2)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32), batch_stats=batch_stats)

    def loss_fn(model, params, batch, rng, batch_stats):
        emb, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["samples"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        # pull same-index embeddings together (dummy objective)
        return -jnp.sum(emb[:2] * emb[2:]), mutated["batch_stats"]

    step = make_train_step(model, tx, None, accum_steps=1, loss_fn=loss_fn,
                           has_batch_stats=True)
    rng = np.random.default_rng(0)
    batch = {"samples": jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)),
                                    jnp.float32)}
    old_mean = np.asarray(
        jax.tree.leaves(state.batch_stats)[0]).copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    new_mean = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    assert not np.allclose(old_mean, new_mean)  # running stats updated


def test_simsiam_v2_train_step():
    model = SimSiamV2(arch="resnet18", dim=64, pred_dim=16)
    x = jnp.zeros((4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.adamw(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32), batch_stats=batch_stats)

    def loss_fn(model, params, batch, rng, batch_stats):
        (p1, z1), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["samples"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return negative_cosine_similarity(p1, z1), mutated["batch_stats"]

    step = make_train_step(model, tx, None, accum_steps=1, loss_fn=loss_fn,
                           has_batch_stats=True)
    rng = np.random.default_rng(0)
    batch = {"samples": jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)),
                                    jnp.float32)}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert -1.0 - 1e-5 <= loss <= 1.0 + 1e-5  # negative cosine in [-1, 1]
