import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.config import default_config
from vit_ed_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    cosine_schedule,
    multistep_schedule,
    weight_decay_mask,
)


def test_cosine_schedule_endpoints():
    s = cosine_schedule(base_lr=1.0, min_lr=0.1, warmup_lr=0.01,
                        total_steps=100, warmup_steps=10, warmup_prefix=True)
    assert abs(float(s(0)) - 0.01) < 1e-6
    # end of warmup reaches base lr
    assert abs(float(s(10)) - 1.0) < 1e-6
    # end of schedule reaches min lr
    assert abs(float(s(100)) - 0.1) < 1e-6
    # midpoint of cosine phase = average of base and min
    assert abs(float(s(55)) - 0.55) < 1e-6


def test_multistep_schedule():
    s = multistep_schedule(base_lr=1.0, warmup_lr=0.0, warmup_steps=0,
                           milestones=[10, 20], gamma=0.1)
    assert abs(float(s(5)) - 1.0) < 1e-6
    assert abs(float(s(10)) - 0.1) < 1e-6
    assert abs(float(s(25)) - 0.01) < 1e-6


def test_weight_decay_mask():
    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        "pos_embed": jnp.ones((1, 5, 4)),
    }
    mask = weight_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["pos_embed"] is True  # multi-dim non-bias decays (ref: ndim>1)


def test_optimizer_step_decreases_loss():
    cfg = default_config()
    cfg.TRAIN.BASE_LR = 0.1
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    sched = lambda step: 0.1
    tx = build_optimizer(cfg, sched, params)
    opt_state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    l0 = loss(params)
    g = jax.grad(loss)(params)
    updates, opt_state = tx.update(g, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)
    assert loss(params) < l0


def test_build_schedule_from_config():
    cfg = default_config()
    cfg.TRAIN.EPOCHS = 10
    cfg.TRAIN.WARMUP_EPOCHS = 2
    cfg.TRAIN.BASE_LR = 1e-3
    cfg.TRAIN.WARMUP_LR = 1e-6
    cfg.TRAIN.MIN_LR = 1e-5
    s = build_schedule(cfg, n_iter_per_epoch=100)
    assert abs(float(s(0)) - 1e-6) < 1e-9
    assert abs(float(s(200)) - 1e-3) < 1e-7
    assert abs(float(s(1000)) - 1e-5) < 1e-8
