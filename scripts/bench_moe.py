"""MoE vs dense ViT-ED train-step benchmark (single chip).

The claim to measure: Switch-routed expert banks (models/moe.py) add
E x the MLP parameters in every second encoder block at a small
step-time overhead — capacity scales, FLOPs/token (and so step time)
roughly don't. Same methodology as scripts/bench_train_step.py: all
iterations inside ONE lax.scan with the (params, opt) carry threaded,
single dispatch, host fetch to synchronize.

Single-chip runs keep the expert banks replicated; the expert axis
sharding (parallel/ep.py) is a multi-chip capacity story and is
validated on the virtual mesh (tests/test_moe.py, dryrun EP phase).

Usage: python scripts/bench_moe.py [--config patch16_512] [--batch 8]
       [--experts 8] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import V5E_BF16_PEAK_TFLOPS  # noqa: E402,F401  (sets up the jax cache)

import vit_ed_tpu  # noqa: E402,F401  (applies VIT_ED_PLATFORM before backend init)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scripts.bench_train_step import CONFIGS  # noqa: E402


def bench_one(config: str, batch: int, iters: int, experts: int,
              interval: int = 2, capacity: float = 1.25):
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.losses import bce_with_logits

    cfg = CONFIGS[config]
    rng = np.random.default_rng(0)
    img = cfg["img_size"]
    x = jnp.asarray(rng.normal(size=(batch, 2, img, img, 3)), jnp.float32)
    y = jnp.asarray(rng.random(size=(batch, cfg["num_classes"])) > 0.5,
                    jnp.float32)

    out = {}
    for name, moe in [("dense", 0), (f"moe{experts}", experts)]:
        model = ViTED(dtype=jnp.bfloat16, moe_experts=moe,
                      moe_interval=interval, moe_capacity=capacity, **cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        tx = optax.adamw(1e-4, weight_decay=0.05)
        opt_state = tx.init(params)

        def loss_fn(p, key, model=model):
            if moe:
                logits, mut = model.apply(
                    {"params": p}, x, train=True, rngs={"dropout": key},
                    mutable=["moe_aux"])
                aux = sum(jnp.asarray(v, jnp.float32).sum()
                          for v in jax.tree.leaves(mut.get("moe_aux", {})))
                return bce_with_logits(logits.astype(jnp.float32), y) + 0.01 * aux
            logits = model.apply({"params": p}, x, train=True,
                                 rngs={"dropout": key})
            return bce_with_logits(logits.astype(jnp.float32), y)

        def run(n, params, opt_state, loss_fn=loss_fn, tx=tx):
            def step(carry, key):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, key)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            keys = jax.random.split(jax.random.PRNGKey(1), n)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return losses

        compiled = jax.jit(run, static_argnums=0).lower(
            iters, params, opt_state).compile()
        np.asarray(compiled(params, opt_state))          # warm
        t0 = time.time()
        losses = np.asarray(compiled(params, opt_state))  # timed
        sec = (time.time() - t0) / iters
        assert np.isfinite(losses).all()
        out[name] = (sec, n_params)
        print(f"{config} batch {batch} {name:>7}: {sec * 1e3:8.1f} ms/step  "
              f"{n_params / 1e6:7.1f} M params  "
              f"{batch / sec:7.1f} pairs/s")
    dense_s, dense_p = out["dense"]
    moe_s, moe_p = out[f"moe{experts}"]
    print(f"--> params x{moe_p / dense_p:.2f}, step-time x{moe_s / dense_s:.3f} "
          f"(overhead {100 * (moe_s / dense_s - 1):+.1f}%)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="patch16_512", choices=sorted(CONFIGS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--experts", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    bench_one(args.config, args.batch, args.iters, args.experts)


if __name__ == "__main__":
    main()
