"""Device-bound training-step benchmark (flagship pjs patch16_512).

The entry-point step time on this 1-core host is dominated by Python
image decode + cv2 augmentation (docs/PERFORMANCE.md); this harness
times the jitted train step alone on device-resident synthetic batches —
the number that governs pod-scale training, where input preparation runs
on many host cores and overlaps compute.

Methodology (remote-backend rules, see bench.py): all steps run inside
ONE lax.scan with the TrainState as the carry (the body is never
loop-invariant), a single dispatch covers every iteration, and the loss
vector is fetched to host to synchronize. FLOPs come from the compiled
program's own cost analysis.

Usage: python scripts/bench_train_step.py [--batches 8,16] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import V5E_BF16_PEAK_TFLOPS  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np
import optax


def useful_flops_per_pair(img=512, patch=16, c=384, depth=12, c_depth=12):
    """Analytic MODEL FLOPs per pair, fwd+bwd (GEMM/attention/conv terms).

    The Pallas pair kernels EXECUTE 2x these attention FLOPs (lane-masked
    full-width dots at head_dim 64), which is what the compiled cost
    analysis counts — so this is the honest numerator for model-FLOP
    utilisation. Backward multipliers: GEMMs/conv 2x fwd; attention
    useful bwd = 2.5x fwd (5 recompute-minimum dots vs 2).

    The LAST decoder block runs in CLS-query mode (only the head's CLS
    row is computed — ViTED.cross_part_cls): its query-dependent terms
    shrink to the 8-sublane kernel rows while qkv/kv projections stay
    full-sequence. The numerator counts that reduced schedule — skipped
    dead rows are NOT credited as useful work.
    """
    s = (img // patch) ** 2         # encoder tokens
    sq = s + 1                      # decoder tokens (CLS)
    sq_cls = 8                      # CLS-mode query rows (sublane pad)
    gemm = 0.0
    attn = 0.0
    # encoder: qkv + proj + mlp(4x) GEMMs, self-attention
    gemm += depth * 24 * s * c * c
    attn += depth * 4 * s * s * c
    for i in range(c_depth):
        q_rows = sq_cls if i == c_depth - 1 else sq
        # self: qkv on the full sequence (k/v needed), proj on q rows
        gemm += 6 * sq * c * c + 2 * q_rows * c * c
        # cross: q + proj on q rows, kv on the context
        gemm += (2 + 2) * q_rows * c * c + 2 * s * c * 2 * c
        # mlp on q rows
        gemm += 16 * q_rows * c * c
        attn += 4 * q_rows * sq * c + 4 * q_rows * s * c
    # patch embed conv (both streams)
    conv = 2 * 2 * s * (patch * patch * 3) * c
    fwd = gemm + attn + conv
    bwd = 2 * (gemm + conv) + 2.5 * attn
    return fwd + bwd


CONFIGS = {
    # flagship HisFrag retrieval model
    "patch16_512": dict(img_size=512, patch_size=16, num_classes=1,
                        embed_dim=384, depth=12, c_depth=12, num_heads=6),
    # DIV2K puzzle model (reference trains this at batch 1024)
    "patch8_64": dict(img_size=64, patch_size=8, num_classes=4,
                      embed_dim=384, depth=8, c_depth=8, num_heads=12),
}


def bench_one(batch: int, iters: int, remat: bool, config: str = "patch16_512"):
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.losses import bce_with_logits

    cfg = CONFIGS[config]
    model = ViTED(dtype=jnp.bfloat16, remat=remat, **cfg)
    rng = np.random.default_rng(0)
    img = cfg["img_size"]
    x = jnp.asarray(rng.normal(size=(batch, 2, img, img, 3)), jnp.float32)
    y = jnp.asarray(rng.random(size=(batch, cfg["num_classes"])) > 0.5,
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    tx = optax.adamw(1e-4, weight_decay=0.05)
    opt_state = tx.init(params)

    def loss_fn(p, key):
        logits = model.apply({"params": p}, x, train=True,
                             rngs={"dropout": key})
        return bce_with_logits(logits.astype(jnp.float32), y)

    def run(n, params, opt_state):
        def step(carry, key):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, key)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        keys = jax.random.split(jax.random.PRNGKey(1), n)
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
        return losses

    lowered = jax.jit(run, static_argnums=0).lower(iters, params, opt_state)
    compiled = lowered.compile()
    # FLOPs from a SINGLE-step program: the scanned executable's cost
    # analysis counts the scan body once, not times the trip count
    try:
        def one(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        analysis = jax.jit(one).lower(
            params, opt_state, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops_per_step = float(analysis["flops"])
    except Exception:
        flops_per_step = None

    np.asarray(compiled(params, opt_state))  # warm (same executable)
    t0 = time.time()
    np.asarray(compiled(params, opt_state))
    sec = (time.time() - t0) / iters
    return sec, flops_per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--config", default="patch16_512", choices=sorted(CONFIGS))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint over blocks (TRAIN.USE_CHECKPOINT)")
    args = ap.parse_args()

    for b in [int(s) for s in args.batches.split(",")]:
        try:
            sec, flops = bench_one(b, args.iters, args.remat, args.config)
        except Exception as e:
            print(f"batch {b}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        line = (f"batch {b:3d} ({'remat' if args.remat else 'no-remat'}): "
                f"{sec * 1e3:7.1f} ms/step  {b / sec:7.1f} pairs/s")
        if flops:
            tfs = flops / sec / 1e12
            line += (f"  {flops / 1e9:7.1f} GF/step executed  {tfs:5.1f} TF/s"
                     f" ({tfs / V5E_BF16_PEAK_TFLOPS * 100:.1f}% HW util)")
        c = CONFIGS[args.config]
        useful = useful_flops_per_pair(
            img=c["img_size"], patch=c["patch_size"], c=c["embed_dim"],
            depth=c["depth"], c_depth=c["c_depth"]) * b
        utfs = useful / sec / 1e12
        line += (f"  |  useful {useful / 1e9:.1f} GF/step -> "
                 f"{utfs / V5E_BF16_PEAK_TFLOPS * 100:.1f}% model-FLOP MFU")
        print(line, flush=True)


if __name__ == "__main__":
    main()
