"""Round-5 decode-schedule measurement: production multi-row dispatch vs the
bench's single-row loop, with an artifact-free timing harness.

Two questions, both on the real chip:

1. How much of the bench headline is *measurement artifact*?  bench.py's
   ``_timed_scan`` defeats XLA loop-invariant hoisting by perturbing the
   first argument with the scan carry (``x + acc * 1e-24``) — a full
   elementwise pass over the [64, 1025, 384] token array (~50 MB of HBM
   traffic at ~250 GB/s effective, ~0.4-0.8 ms) paid per 64-pair
   iteration (~60 ms).  Scanning over *per-iteration pair indices* (xs)
   instead makes the body iteration-dependent for free — the gather is
   production work (score_rows_block regathers per chunk), and nothing
   else is perturbed.

2. Does the production multi-row schedule (PairwiseScorer._score_rows,
   rows_per_dispatch=64) beat the single-row-per-iteration loop when both
   are measured artifact-free, and what is the best R?  The round-5
   N=2k scan and bench_multirow_kernel.py showed R=4 beating R=1 by 3.8%
   under the perturbed harness; this separates kernel effect from
   artifact.

Variants (identical per-pair math; outputs array_equal-asserted):
  A  single row, chunk 64, xs-driven indices           (bench-equivalent)
  B  R rows x chunk 64 inside one scan body, xs-driven (production)
     for R in {2, 4, 8, 16}
  C  variant A with the legacy carry-perturbation      (current bench.py)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import Timing  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np


def timed_xs(fn, xs, consts, iters, repeats=6):
    """Scan fn over per-iteration xs (tuple of [iters, ...] arrays);
    consts are loop-invariant. Returns Timing of per-iteration seconds."""

    def multi(xs_, *consts_):
        def body(acc, x):
            out = fn(x, *consts_)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)
        return acc

    jmulti = jax.jit(multi)
    np.asarray(jmulti(xs, *consts))  # compile + warm
    secs = []
    for _ in range(max(repeats, 1)):
        t0 = time.time()
        np.asarray(jmulti(xs, *consts))
        secs.append((time.time() - t0) / iters)
    return Timing(secs)


def timed_carry(fn, args, iters, repeats=6):
    """The legacy bench.py harness: carry-perturbs args[0]."""

    def multi(x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return acc

    jmulti = jax.jit(multi)
    np.asarray(jmulti(*args))
    secs = []
    for _ in range(max(repeats, 1)):
        t0 = time.time()
        np.asarray(jmulti(*args))
        secs.append((time.time() - t0) / iters)
    return Timing(secs)


def main():
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg = 16
    batch = 64
    iters = 16
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]

    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_rows = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats)

    def score_row(p, kvs, t, ri, pj):
        kv_r = jax.lax.dynamic_slice_in_dim(kvs, ri, 1, axis=1)
        return model.apply({"params": p}, kv_r, jnp.take(t, pj, axis=0),
                           method=model.score_tokens_row)

    def report(label, n_pairs, t):
        r = n_pairs / t.best
        print(f"{label}: {r:7.1f} pairs/s  (median {n_pairs / t.median:.1f},"
              f" spread {t.spread_pct:.1f}%)", flush=True)
        return r

    # --- C: legacy carry-perturbed harness, single row (bench.py today) ---
    kv1 = kv_rows[:, :1]
    pj64 = jnp.asarray(rng.integers(0, nimg, size=batch), jnp.int32)
    tc = timed_carry(
        lambda t, p, kv, j: model.apply({"params": p}, kv,
                                        jnp.take(t, j, axis=0),
                                        method=model.score_tokens_row),
        (tokens, params, kv1, pj64), iters)
    report("C legacy carry-perturbed 1 row x 64", batch, tc)

    # --- A: xs-driven single row ---
    ri_a = jnp.asarray(rng.integers(0, nimg, size=iters), jnp.int32)
    pj_a = jnp.asarray(rng.integers(0, nimg, size=(iters, batch)), jnp.int32)
    ta = timed_xs(
        lambda xi, p, kvs, t: score_row(p, kvs, t, xi[0], xi[1]),
        (ri_a, pj_a), (params, kv_rows, tokens), iters)
    report("A xs-driven            1 row x 64", batch, ta)

    # --- B: xs-driven multi-row (production _score_rows schedule) ---
    def score_rows(p, kvs, t, ri, pj):
        def body(_, rp):
            return _, score_row(p, kvs, t, rp[0], rp[1])

        _, out = jax.lax.scan(body, 0, (ri, pj))
        return out

    for n_rows in (2, 4, 8, 16):
        ri = jnp.asarray(rng.integers(0, nimg, size=(iters, n_rows)),
                         jnp.int32)
        pj = jnp.asarray(
            rng.integers(0, nimg, size=(iters, n_rows, batch)), jnp.int32)
        tb = timed_xs(
            lambda xi, p, kvs, t: score_rows(p, kvs, t, xi[0], xi[1]),
            (ri, pj), (params, kv_rows, tokens), iters)
        report(f"B xs-driven {n_rows:2d} rows x 64 "
               f"({n_rows * batch} pairs/dispatch)", n_rows * batch, tb)

    # numerics: xs/multi-row path equals the bench path on identical pairs
    base = np.asarray(jax.jit(
        lambda p, kv, t, j: model.apply({"params": p}, kv,
                                        jnp.take(t, j, axis=0),
                                        method=model.score_tokens_row))(
        params, kv1, tokens, pj64))
    got = np.asarray(jax.jit(score_rows)(
        params, kv_rows, tokens, jnp.zeros((1,), jnp.int32), pj64[None]))[0]
    np.testing.assert_array_equal(got, base)
    print("multi-row xs output array_equal to bench path: OK", flush=True)


if __name__ == "__main__":
    main()
