"""Pair-kernel variant: ONE logits dot + ONE PV dot per head pair.

K_cat [2*skp, 128] = [k*mask_lo ; k*mask_hi] (sublane stack) gives
logits_cat [bq, 2*skp] = [l_h0 | l_h1] in a single dot;
V_bd [2*skp, 128] = [v*mask_lo ; v*mask_hi] gives
o_pair = p_cat @ V_bd = [o_h0 | o_h1] in a single dot.
skp is padded to 128 so the half boundary is lane-aligned for the
per-half softmax.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ed_tpu.ops.attention import _pair_forward


def _round_up(a, b):
    return -(-a // b) * b


def concat_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, skp):
    q = q_ref[0]                      # [bq, 128]
    k = k_ref[0]                      # [skp, 128]
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_cat = jnp.concatenate([jnp.where(lane < 64, k, jnp.zeros_like(k)),
                             jnp.where(lane >= 64, k, jnp.zeros_like(k))],
                            axis=0)   # [2*skp, 128]
    v_bd = jnp.concatenate([jnp.where(lane < 64, v, jnp.zeros_like(v)),
                            jnp.where(lane >= 64, v, jnp.zeros_like(v))],
                           axis=0)

    logits = jax.lax.dot_general(
        q, k_cat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [bq, 2*skp]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = jnp.logical_or(col < kv_len,
                           jnp.logical_and(col >= skp, col < skp + kv_len))
    logits = jnp.where(valid, logits, -jnp.inf)

    # per-half softmax via lane-aligned slices
    def half_probs(lg):
        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        return (e / s).astype(v.dtype)

    p0 = half_probs(logits[:, :skp])
    p1 = half_probs(logits[:, skp:])
    p_cat = jnp.concatenate([p0, p1], axis=1)             # [bq, 2*skp]

    o = jax.lax.dot_general(p_cat, v_bd, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def concat_attention(q, k, v, scale):
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128
    n_blocks = -(-sq // 512)
    block_q = _round_up(-(-sq // n_blocks), 8)
    sq_pad = block_q * n_blocks
    skp = _round_up(max(sk, 128), 128)   # lane-aligned half boundary
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skp != sk:
        k = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))
    out = pl.pallas_call(
        functools.partial(concat_kernel, scale=scale, kv_len=sk, skp=skp),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)
    return out[:, :sq, :]


def timed(fn, args, iters=30):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            return jnp.sum(fn(xi, *rest).astype(jnp.float32)) * 1e-24, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for SQ, SK in [(1024, 1024), (1025, 1024), (1025, 1025)]:
        q = jnp.asarray(rng.normal(size=(32, SQ, 384)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(32, SK, 384)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(32, SK, 384)), jnp.bfloat16)
        try:
            sec_p = timed(lambda a, b_, c_: _pair_forward(a, b_, c_, 0.125),
                          (q, k, v))
            sec_c = timed(lambda a, b_, c_: concat_attention(a, b_, c_, 0.125),
                          (q, k, v))
            d = np.abs(
                np.asarray(_pair_forward(q, k, v, 0.125), np.float32)
                - np.asarray(concat_attention(q, k, v, 0.125), np.float32)).max()
            print(f"Sq={SQ} Sk={SK}: pair {sec_p*1e6:7.1f}us  "
                  f"concat {sec_c*1e6:7.1f}us  maxdiff {d:.1e}", flush=True)
        except Exception as e:
            print(f"Sq={SQ} Sk={SK}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
