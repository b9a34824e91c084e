"""Experiment: deferred-normalization fused pair BACKWARD.

Applies the round-3 forward tricks to _pair_bwd_kernel:
- clamp exp2 instead of max-subtracted exp (no max lane-reduction)
- s from a narrow ones-matmul (1 MXU n-tile) instead of a sum reduce
- delta = rowsum(do * o) over 128 lanes (flash-bwd identity; needs the
  forward OUTPUT as a residual) instead of rowsum(dp * p) over sk
- p never materialized: dv = e^T (do/s), ds = e * ((dp - delta) * scale/s)
"""

import functools
import math
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

from vit_ed_tpu.ops.attention import (
    _pair_backward,
    _pair_forward,
    _pair_geometry,
    reference_attention,
)

LOG2E = math.log2(math.e)
CLAMP = 80.0


def timed(fn, args, iters=20):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-24, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def _bwd_kernel_v2(q_ref, k_ref, v_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref,
                   dk_acc, dv_acc, *, scale: float, kv_len: int):
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kv_lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    q_lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    ones8 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], 8), 0) < kv_len,
        1.0, 0.0).astype(v.dtype)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    def head(is_lo):
        k_m = jnp.where((kv_lane < 64) == is_lo, k, jnp.zeros_like(k))
        q_m = jnp.where((q_lane < 64) == is_lo, q, jnp.zeros_like(q))
        do_m = jnp.where((q_lane < 64) == is_lo, do, jnp.zeros_like(do))
        o_m = jnp.where((q_lane < 64) == is_lo, o, jnp.zeros_like(o))

        l = jax.lax.dot_general(
            qs, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [bq, sk_pad]
        e = jnp.exp2(jnp.minimum(l, CLAMP)).astype(v.dtype)
        s = jax.lax.dot_general(
            e, ones8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0:1]     # [bq, 1]
        delta = jnp.sum(do_m.astype(jnp.float32) * o_m.astype(jnp.float32),
                        axis=-1, keepdims=True)             # [bq, 1]
        dp = jax.lax.dot_general(
            do_m, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bq, sk_pad]
        rs = scale / s
        ds = (e.astype(jnp.float32) * ((dp - delta) * rs)).astype(v.dtype)
        do_s = (do_m.astype(jnp.float32) / s).astype(v.dtype)   # [bq, 128]

        dq_part = jax.lax.dot_general(
            ds, k_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bq, 128]
        dv_acc[...] += jax.lax.dot_general(
            e, do_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [sk_pad, 128]
        dk_acc[...] += jax.lax.dot_general(
            ds, q_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_part

    dq_ref[0] = (head(True) + head(False)).astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_kernel_v3(q_ref, k_ref, v_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref,
                   dk_acc, dv_acc, *, scale: float, kv_len: int):
    """v2 + dv/dk computed TRANSPOSED: the (0,0)-contraction dots made the
    big [bq, sk] operands the transposed side; here the SMALL [bq, 128]
    matrices are transposed instead and the accumulators live [128, sk]."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kv_lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    q_lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    ones8 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], 8), 0) < kv_len,
        1.0, 0.0).astype(v.dtype)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    def head(is_lo, half):
        k_m = jnp.where((kv_lane < 64) == is_lo, k, jnp.zeros_like(k))
        q_m = jnp.where((q_lane < 64) == is_lo, q, jnp.zeros_like(q))
        do_m = jnp.where((q_lane < 64) == is_lo, do, jnp.zeros_like(do))
        o_m = jnp.where((q_lane < 64) == is_lo, o, jnp.zeros_like(o))

        l = jax.lax.dot_general(
            qs, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = jnp.exp2(jnp.minimum(l, CLAMP)).astype(v.dtype)
        s = jax.lax.dot_general(
            e, ones8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0:1]
        delta = jnp.sum(do_m.astype(jnp.float32) * o_m.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            do_m, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        rs = scale / s
        ds = (e.astype(jnp.float32) * ((dp - delta) * rs)).astype(v.dtype)
        do_s = (do_m.astype(jnp.float32) / s).astype(v.dtype)

        dq_part = jax.lax.dot_general(
            ds, k_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # transpose the SMALL [bq, 128] side; accumulate [128, sk_pad]
        do_s_t = do_s.T                                  # [128, bq]
        q_m_t = q_m.T
        dv_acc[...] += jax.lax.dot_general(
            do_s_t, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [128, sk_pad]
        dk_acc[...] += jax.lax.dot_general(
            q_m_t, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_part

    dq_ref[0] = (head(True, 0) + head(False, 1)).astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].T.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].T.astype(dv_ref.dtype)


def pair_backward_v3(q, k, v, do, o, scale, target=512):
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=target)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, sq_pad - sq), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    kernel = functools.partial(_bwd_kernel_v3, scale=scale, kv_len=sk)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda bi, gi, i: (bi, i, gi),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk_pad, 128), lambda bi, gi, i: (bi, 0, gi),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, g, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, sk_pad), jnp.float32),
            pltpu.VMEM((128, sk_pad), jnp.float32),
        ],
    )(q, k, v, do, o)
    return dq[:, :sq, :], dk[:, :sk, :], dv[:, :sk, :]


def pair_backward_v2(q, k, v, do, o, scale, target=512):
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=target)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, sq_pad - sq), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    kernel = functools.partial(_bwd_kernel_v2, scale=scale, kv_len=sk)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda bi, gi, i: (bi, i, gi),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk_pad, 128), lambda bi, gi, i: (bi, 0, gi),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, g, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk_pad, 128), jnp.float32),
            pltpu.VMEM((sk_pad, 128), jnp.float32),
        ],
    )(q, k, v, do, o)
    return dq[:, :sq, :], dk[:, :sk, :], dv[:, :sk, :]


def to_heads(x, h):
    b, s, c = x.shape
    return x.reshape(b, s, h, c // h).transpose(0, 2, 1, 3)


def ref_grads(q, k, v, do, h, scale):
    def f(q_, k_, v_):
        out = reference_attention(to_heads(q_, h), to_heads(k_, h),
                                  to_heads(v_, h), scale)
        b, _, s, d = out.shape
        return jnp.sum(out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
                       * do.astype(out.dtype))

    return jax.grad(f, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    h = 6
    for (name, b, sq, sk, c) in [
        ("self1025_b16", 16, 1025, 1025, 384),
        ("cross1025_b16", 16, 1025, 1024, 384),
        ("self1024_b16", 16, 1024, 1024, 384),
    ]:
        q = jnp.asarray(rng.normal(size=(b, sq, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, sk, c)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, sk, c)), jnp.bfloat16)
        do = jnp.asarray(rng.normal(size=(b, sq, c)), jnp.bfloat16)
        scale = 1.0 / math.sqrt(64)

        o = _pair_forward(q, k, v, scale)
        gr = ref_grads(q, k, v, do, h, scale)

        old = _pair_backward(q, k, v, do, scale)
        new = pair_backward_v2(q, k, v, do, o, scale)
        for gname, go, gn, grf in zip(("dq", "dk", "dv"), old, new, gr):
            eo = np.abs(np.asarray(go, np.float32) - np.asarray(grf)).max()
            en = np.abs(np.asarray(gn, np.float32) - np.asarray(grf)).max()
            print(f"  {name} {gname}: old err {eo:.4f} new err {en:.4f}")

        useful = 10 * b * h * sq * sk * 64   # 5 matmuls per head
        t_o = timed(lambda qq, kk, vv, dd: _pair_backward(qq, kk, vv, dd, scale),
                    (q, k, v, do))
        t_n = timed(lambda qq, kk, vv, dd, oo: pair_backward_v2(qq, kk, vv, dd, oo, scale),
                    (q, k, v, do, o))
        v3 = pair_backward_v3(q, k, v, do, o, scale)
        for gname, gn, grf in zip(("dq", "dk", "dv"), v3, gr):
            en = np.abs(np.asarray(gn, np.float32) - np.asarray(grf)).max()
            print(f"  {name} {gname}: v3 err {en:.4f}")
        t_n2 = timed(lambda qq, kk, vv, dd, oo: pair_backward_v3(
            qq, kk, vv, dd, oo, scale), (q, k, v, do, o))
        t_n3 = timed(lambda qq, kk, vv, dd, oo: pair_backward_v3(
            qq, kk, vv, dd, oo, scale, target=1024), (q, k, v, do, o))
        print(f"{name}: old {t_o*1e6:.0f}us ({useful/t_o/1e12:.1f} useful TF/s) | "
              f"v2 {t_n*1e6:.0f}us ({useful/t_n/1e12:.1f}) | "
              f"v3 {t_n2*1e6:.0f}us ({useful/t_n2/1e12:.1f}) | "
              f"v3 bq1024 {t_n3*1e6:.0f}us ({useful/t_n3/1e12:.1f})")


if __name__ == "__main__":
    main()
