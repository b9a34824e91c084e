"""Measure the decode impact of the minimal-degree bit-exact erfc fits.

scripts/fit_gelu_poly.py found that the shipped degree-10 central /
degree-10 tail polynomials in ops/gelu.py have spare accuracy: central
degree 9 + tail degree 8 still pass the exhaustive 65536-input bitwise
check vs lax.erfc (3 fewer VPU FMAs per hidden element in every fc2
fusion of the decode).  This script re-verifies the exhaustive check on
the REAL backend, then A/B-measures the flagship decode rate with the
production multi-row schedule.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import Timing  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np

# degree-9 central / degree-8 tail fits (scripts/fit_gelu_poly.py output)
CENTRAL_9 = (
    1.1283791324344097,
    -0.376124028500445,
    0.11282146497007951,
    -0.026824271269082278,
    0.005170509654640366,
    -0.0008154072167979049,
    0.00010243830370133255,
    -9.51539404137054e-06,
    5.678221080856205e-07,
    -1.5965741085201898e-08,
)
TAIL_8 = (
    0.09391770142781804,
    -0.058192865893360105,
    0.03570651911739498,
    -0.022298662314569763,
    0.012920640648579028,
    -0.005017068929615902,
    0.003624703771738232,
    -0.005682589151180357,
    0.0028841162427360985,
)


def exhaustive_ok():
    from vit_ed_tpu.ops import gelu as G

    bits = np.arange(65536, dtype=np.uint16)
    u = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)
    ours = jax.jit(G.erfc_bf16)(u)
    xla = jax.jit(jax.lax.erfc)(u)
    ob = np.asarray(jax.lax.bitcast_convert_type(ours, jnp.uint16))
    xb = np.asarray(jax.lax.bitcast_convert_type(xla, jnp.uint16))
    nan = np.asarray(jnp.isnan(ours) & jnp.isnan(xla))
    return int(((ob != xb) & ~nan).sum())


def timed_pipelined(fn, make_args, n_dispatch=9, groups=3, per_group=3):
    args = [make_args(k) for k in range(n_dispatch)]
    np.asarray(fn(*args[0]))
    secs = []
    k = 0
    for _ in range(groups):
        batch = [args[(k + i) % n_dispatch] for i in range(per_group)]
        k += per_group
        t0 = time.time()
        outs = [fn(*a) for a in batch]
        for o in outs:
            np.asarray(o)
        secs.append((time.time() - t0) / per_group)
    return Timing(secs)


def measure(model, params, kv_rows, tokens, nimg, label):
    def score_rows(p, kvs, t, ri, pj):
        def body(_, rp):
            r, pjr = rp
            kv_r = jax.lax.dynamic_slice_in_dim(kvs, r, 1, axis=1)
            return _, model.apply({"params": p}, kv_r,
                                  jnp.take(t, pjr, axis=0),
                                  method=model.score_tokens_row)

        _, out = jax.lax.scan(body, 0, (ri, pj))
        return out

    jrows = jax.jit(score_rows)
    n_rows, chunk = 16, 64

    def make_args(k):
        r = np.random.default_rng(100 + k)
        return (params, kv_rows, tokens,
                jnp.asarray(r.integers(0, nimg, size=n_rows), jnp.int32),
                jnp.asarray(r.integers(0, nimg, size=(n_rows, chunk)),
                            jnp.int32))

    t = timed_pipelined(jrows, make_args)
    rate = n_rows * chunk / t.best
    print(f"{label}: {rate:7.1f} pairs/s (median "
          f"{n_rows * chunk / t.median:.1f}, spread {t.spread_pct:.1f}%)",
          flush=True)
    return rate


def main():
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.ops import gelu as G

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    nimg = 16
    x = jnp.asarray(rng.normal(size=(nimg, 2, 512, 512, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]
    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=model.prepare_x2_scan))(params, x[:, 1])
    kv_rows = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method=model.context_kv_cache))(params, feats)

    assert exhaustive_ok() == 0, "shipped erfc not bit-exact on this backend"
    r_shipped = measure(model, params, kv_rows, tokens, nimg,
                        "shipped  degree 10/10")

    # swap in the minimal-degree coefficients and re-trace
    old_c, old_t = G._CENTRAL, G._TAIL
    G._CENTRAL, G._TAIL = CENTRAL_9, TAIL_8
    jax.clear_caches()
    try:
        n = exhaustive_ok()
        print(f"minimal 9/8 exhaustive mismatches on this backend: {n}",
              flush=True)
        assert n == 0
        r_min = measure(model, params, kv_rows, tokens, nimg,
                        "minimal  degree  9/8 ")
        print(f"speedup: {r_min / r_shipped:.4f}x", flush=True)
    finally:
        G._CENTRAL, G._TAIL = old_c, old_t


if __name__ == "__main__":
    main()
