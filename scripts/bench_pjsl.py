"""pjs-L on a single chip: forward, decode rate, and a remat train step.

The configs/scale/hisfrag20_pjsL_* files define the pjs-L geometry
(embed 1024, depth 24 + 24, 16 heads — head_dim 64, the packed kernels'
native shape) for 8-chip TP+SP / MoE-hybrid pods; this script proves the
same geometry is real on ONE v5e at reduced batch: a full pair forward,
the row-sharded decode schedule, and a gradient train step under
jax.checkpoint (TRAIN.USE_CHECKPOINT) with AdamW.

Per-pair decode work, same schedule accounting as bench.py/bench_vitb:
GEMM terms scale C^2 from the C=384 measurement (46.25 GF -> x(1024/384)^2
= 328.9) and attention terms scale C (33.9 -> x(1024/384) = 90.4):
419.3 GF/pair.

Usage: python scripts/bench_pjsl.py [--batch 8] [--train-batch 2]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np
import optax

GF_PER_PAIR = 419.3   # decode schedule at C=1024 (see module docstring)
PEAK_TF = 197.0       # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8, help="decode pair chunk")
    ap.add_argument("--train-batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--serving", action="store_true",
                    help="also export a pjs-L score_row bundle and time "
                         "its replay vs the live jitted call")
    args = ap.parse_args()

    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.losses import bce_with_logits

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=1024,
                  depth=24, c_depth=24, num_heads=16, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg = 4
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"pjs-L params: {n_params / 1e6:.1f}M (init {time.time() - t0:.0f}s)",
          flush=True)

    if not args.train_only:
        # full pair forward (the reference's eval op)
        full = _timed_scan(lambda a, p: model.apply({"params": p}, a),
                           (x, params), args.iters)
        print(f"pjs-L full pair-forward: {nimg / full:.2f} pairs/s",
              flush=True)

    # row-sharded decode schedule (the O(N^2) scan inner op)
    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_row = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats[:1])
    pj = jnp.asarray(rng.integers(0, nimg, size=args.batch), jnp.int32)
    if not args.train_only:
        sec = _timed_scan(
            lambda t, p, kv, j: model.apply(
                {"params": p}, kv, jnp.take(t, j, axis=0),
                method=model.score_tokens_row),
            (tokens, params, kv_row, pj), args.iters)
        rate = args.batch / sec
        print(f"pjs-L patch16_512 decode: {rate:.1f} pairs/s "
              f"({GF_PER_PAIR} GF/pair -> "
              f"{rate * GF_PER_PAIR / 1000:.1f} TF/s, "
              f"{rate * GF_PER_PAIR / 1000 / PEAK_TF * 100:.1f}% MFU)",
              flush=True)

    if args.serving:
        # pjs-L serving bundle: export score_row via jax.export and replay
        # it through the jit-cached scorer (the production serving path)
        import tempfile

        from vit_ed_tpu.serve import export_scorer, load_scorer

        out = tempfile.mkdtemp(prefix="pjsl_bundle_")
        t0 = time.time()
        export_scorer(model, params, out, stages=("score_row",))
        print(f"pjs-L score_row bundle export: {time.time() - t0:.0f}s",
              flush=True)
        scorer = load_scorer(out)
        toks_b = jnp.take(tokens, pj, axis=0)
        # time through the artifact's own jitted call with the params as
        # an ARGUMENT — closing over them would bake 2.8 GB of constants
        # into the timing jit (breaks the remote-compile transport)
        call = scorer._jitted["score_row"][0]
        sec_b = _timed_scan(lambda t, kv, p: call(p, kv, t),
                            (toks_b, kv_row, scorer.params), args.iters)
        print(f"pjs-L bundle score_row: {args.batch / sec_b:.1f} pairs/s "
              f"(live schedule above for the ratio)", flush=True)
        return  # the bundle's second param copy + train state would OOM

    # train step with remat (the single-chip memory recipe at this scale):
    # 707M params -> 8.5 GB of f32 param+AdamW state on a 16 GB chip, so
    # the step donates its state (no second copy) and the decode-phase
    # arrays are freed first
    tmodel = model.clone(remat=True)
    tb = args.train_batch
    tx = optax.adamw(1e-4, weight_decay=0.05)
    opt_state = tx.init(params)
    y = jnp.asarray(rng.random(size=(tb, 1)) > 0.5, jnp.float32)
    xt = x[:tb]
    for a in (feats, tokens, kv_row, pj):
        a.delete()

    def loss_fn(p, key):
        logits = tmodel.apply({"params": p}, xt, train=True,
                              rngs={"dropout": key})
        return bce_with_logits(logits.astype(jnp.float32), y)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    key = jax.random.PRNGKey(1)
    params2, opt_state, loss = train_step(params, opt_state, key)
    np.asarray(loss)  # sync (compile + first step)
    t0 = time.perf_counter()
    for i in range(args.iters):
        params2, opt_state, loss = train_step(params2, opt_state,
                                              jax.random.fold_in(key, i))
    loss_h = float(np.asarray(loss))
    step_s = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(loss_h)
    print(f"pjs-L train step (remat, batch {tb}): {step_s * 1e3:.1f} ms "
          f"({tb / step_s:.2f} pairs/s, loss {loss_h:.4f})", flush=True)


if __name__ == "__main__":
    main()
