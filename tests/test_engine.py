"""Engine-level contracts: grad accumulation equivalence, donation safety."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.train.engine import TrainState, make_train_step
from vit_ed_tpu.train.losses import bce_with_logits


def _setup():
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    x = jnp.zeros((1, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, jax.device_get(variables["params"])


def test_grad_accum_equivalence():
    """A step over [2, B, ...] microbatches must equal a single step over
    the concatenated [2B, ...] batch (reference loss/accum semantics,
    misc/engine.py:212-231)."""
    model, params = _setup()
    tx = optax.sgd(0.1)  # plain SGD: update == -lr * mean grad

    rng = np.random.default_rng(0)
    samples = rng.normal(size=(4, 2, 32, 32, 3)).astype(np.float32)
    targets = (rng.random(size=(4, 4)) > 0.5).astype(np.float32)

    def run(accum):
        state = TrainState(params=jax.tree.map(jnp.asarray, params),
                           opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx, bce_with_logits, accum_steps=accum)
        if accum == 1:
            batch = {"samples": samples[None], "targets": targets[None]}
        else:
            batch = {"samples": samples.reshape(2, 2, 2, 32, 32, 3),
                     "targets": targets.reshape(2, 2, 4)}
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return jax.device_get(state.params), float(metrics["loss"])

    p1, l1 = run(1)
    p2, l2 = run(2)
    assert abs(l1 - l2) < 1e-6
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_step_counter_increments_once_per_update():
    model, params = _setup()
    tx = optax.adamw(1e-3)
    state = TrainState(params=jax.tree.map(jnp.asarray, params),
                       opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, bce_with_logits, accum_steps=2)
    batch = {"samples": jnp.zeros((2, 2, 2, 32, 32, 3)),
             "targets": jnp.zeros((2, 2, 4))}
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert int(state.step) == 1  # one optimizer update despite 2 microbatches
