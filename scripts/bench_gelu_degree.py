"""Measure the decode impact of the round-5 minimal-degree erfc chain.

scripts/fit_gelu_poly.py found the round-2 erfc (degree-10 central poly +
degree-10 scaled-u tail) had spare accuracy under the exhaustive
65536-input bitwise oracle: central passes at degree 8 after oracle-
guided coefficient refinement, the z-form tail at degree 8, and the
tail in its asymptotic variable w = 1/u^2 at degree THREE. ops/gelu.py
now ships degree-8 central + degree-8 z-form tail (~18 FMAs + exp2,
down from ~23).

Why not the w-form? Fewer FMAs but ONE f32 divide — and on the chip the
divide costs more than the seven FMAs it saves (TPU f32 division is a
multi-pass VPU sequence). Round-5 same-day measurements, production
multi-row schedule, spreads 0.0-0.1%:

    retired 10/10 z-form chain   : 1,079.1-1,079.7 pairs/s
    central 9 + tail 8 z-form    : 1,101.0 pairs/s (+1.97%)
    central 8 + w-form 3 (divide): 1,090.5 pairs/s (+1.06%) — REFUSED
    shipped central 8 + tail 8   : see run output

This script re-verifies the exhaustive bitwise check on the REAL
backend, then A/B-measures the retired round-2 chain (reconstructed
locally) vs the shipped one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import Timing  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np

# The RETIRED round-2 coefficients (degree-10 central, degree-10 tail in
# z = (u - 5.925)/3.775), kept here so the A/B stays reproducible.
CENTRAL_10 = (
    1.128379157327484,
    -0.37612594026672824,
    0.11283464216109934,
    -0.026856775950366136,
    0.005210026991203056,
    -0.0008425888303991454,
    0.00011372000286070129,
    -1.2396889892820672e-05,
    1.0108258427126519e-06,
    -5.356591074518983e-08,
    1.3534507450273756e-09,
)
TAIL_10_Z = (
    0.09392002877070377,
    -0.05825032949372874,
    0.03565594311410055,
    -0.021452046041262322,
    0.012911018961654263,
    -0.008280547812929978,
    0.004570889044909737,
    -0.0011111130955624548,
    0.0009572567150144008,
    -0.0021086644129196842,
    0.0010474100578767717,
)


def _retired_erfc_f32(uf):
    from vit_ed_tpu.ops.gelu import _horner, _UMAX, _TAIL_LO, _TAIL_HI, \
        _LOG2E

    uc = jnp.clip(uf, -_UMAX, _UMAX)
    central = 1.0 - uc * _horner(uc * uc, CENTRAL_10)
    ut = jnp.clip(uf, _TAIL_LO, _TAIL_HI)
    z = (ut - jnp.float32(5.925)) * jnp.float32(1.0 / 3.775)
    tail = jnp.exp2((ut * ut) * jnp.float32(-_LOG2E)) * _horner(z, TAIL_10_Z)
    return jnp.where(uf > _TAIL_LO, tail, central)


def exhaustive_ok(erfc_bf16_fn):
    bits = np.arange(65536, dtype=np.uint16)
    u = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)
    ours = jax.jit(erfc_bf16_fn)(u)
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

    n = exhaustive_ok(G.erfc_bf16)
    print(f"shipped erfc exhaustive mismatches on this backend: {n}",
          flush=True)
    assert n == 0
    n = exhaustive_ok(
        lambda u: _retired_erfc_f32(u.astype(jnp.float32))
        .astype(jnp.bfloat16))
    print(f"retired 10/10 chain mismatches on this backend: {n}", flush=True)

    # retired chain first (monkeypatch the core), then the shipped one
    new_core = G._erfc_f32
    G._erfc_f32 = _retired_erfc_f32
    jax.clear_caches()
    try:
        r_old = measure(model, params, kv_rows, tokens, nimg,
                        "retired 10/10 z-form")
    finally:
        G._erfc_f32 = new_core
    jax.clear_caches()
    r_new = measure(model, params, kv_rows, tokens, nimg,
                    "shipped  central 8 + tail 8")
    print(f"speedup: {r_new / r_old:.4f}x", flush=True)


if __name__ == "__main__":
    main()
