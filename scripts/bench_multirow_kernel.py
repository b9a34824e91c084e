"""Multi-row decode invocation at ViT-S: the last unmeasured S-shape lever.

VERDICT r4 weak-3: pjs-B reaches ~50% MFU on the same kernels while the
flagship S decode sits at ~43%, attributed to invocation/VPU overhead at
d=64 — but "deeper row batching / multi-row kernel invocations at S were
not among the measured refusals". This measures them:

  baseline   1 row-context, chunk 64 pairs per launch (the bench schedule)
  variant A  lax.scan over R rows x chunk 64/R pairs — more, smaller
             shared-context launches per dispatch (VMEM working set per
             launch shrinks; launch count grows)
  variant B  R rows x chunk 64 each — R x the pairs per dispatch at the
             known-optimal chunk (tests whether amortizing the scan
             ladder/prologue over more launches helps at fixed chunk)

All variants execute the identical per-pair math (same kernels, same
row-sharded schedule — variant outputs array_equal to the baseline's,
asserted below). Rates are pairs/s on the real chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vit_ed_tpu.models.vit_ed import ViTED

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg = 8
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]

    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_rows = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats)

    def score_one(p, kv, t, pj):
        return model.apply({"params": p}, kv, jnp.take(t, pj, axis=0),
                           method=model.score_tokens_row)

    def rate(label, n_pairs, fn, args):
        t = _timed_scan(fn, args, 10)
        r = n_pairs / t.best
        print(f"{label}: {r:.1f} pairs/s (spread {t.spread_pct:.1f}%)",
              flush=True)
        return r

    pj64 = jnp.asarray(rng.integers(0, nimg, size=64), jnp.int32)
    kv1 = kv_rows[:, :1]  # [c_depth, 1, Sk, 2C]

    base_out = None

    def score_base(p, kv, t, j):
        return score_one(p, kv, t, j)

    base = rate("baseline 1 row x chunk 64",
                64, lambda t, p, kv, j: score_base(p, kv, t, j),
                (tokens, params, kv1, pj64))
    base_out = np.asarray(jax.jit(score_base)(params, kv1, tokens, pj64))

    for n_rows, chunk in ((2, 32), (4, 16), (2, 64), (4, 64)):
        ri = jnp.asarray(rng.integers(0, nimg, size=n_rows), jnp.int32)
        pj = jnp.asarray(rng.integers(0, nimg, size=(n_rows, chunk)),
                         jnp.int32)

        def multi(t, p, kvs, ri_, pj_):
            def body(_, rp):
                r, pjr = rp
                kv_r = jax.lax.dynamic_slice_in_dim(kvs, r, 1, 1)
                return _, score_one(p, kv_r, t, pjr)

            _, out = jax.lax.scan(body, 0, (ri_, pj_))
            return out

        rate(f"{n_rows} rows x chunk {chunk} ({n_rows * chunk} pairs/dispatch)",
             n_rows * chunk, multi, (tokens, params, kv_rows, ri, pj))

    # numerics: a multi-row scan over (row 0, pj64) equals the baseline
    got = np.asarray(jax.jit(multi)(tokens, params, kv_rows,
                                    jnp.zeros((1,), jnp.int32),
                                    pj64[None]))[0]
    np.testing.assert_array_equal(got, base_out)
    print("multi-row output array_equal to baseline: OK", flush=True)


if __name__ == "__main__":
    main()
