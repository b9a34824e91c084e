"""Fused multi-head attention for TPU (Pallas), with an XLA reference path.

This is the TPU-native replacement for the reference's implicit use of
``F.scaled_dot_product_attention`` (/root/reference/models/vision_transformer.py:63-66
and :183-186). One kernel serves both self-attention (q == kv source) and
cross-attention (decoder queries attending to encoder context,
vision_transformer.py:174-200) — the kernel only sees q/k/v.

Design notes (see /opt/skills/guides/pallas_guide.md):

- ViT-ED sequences are short (<= ~1025 tokens + padding), so the whole K/V
  for one (batch, head) fits comfortably in VMEM (1152 x 64 bf16 ~ 147 KB).
  We therefore use a single-pass softmax over the full key axis per query
  block instead of an online-softmax flash loop: fewer passes, same memory.
- Grid is (batch*heads, q_blocks); Q blocks of 128 rows ride the MXU.
- Padded key positions are masked with -inf before the softmax; padded query
  rows are garbage and sliced off by the caller.
- Backward recomputes the attention matrix (FLOPs are cheap, HBM is not).
  The packed [B, S, C] path uses ONE fused kernel producing dQ/dK/dV
  (``_pair_bwd_kernel``: probs recomputed once, no transposes); the 4-D
  fallback path keeps the two-kernel dQ / dK-dV design over the
  transposed grid.

All matmuls accumulate in float32 (``preferred_element_type``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests to run kernels on CPU


def _cost(flops, bytes_accessed, transcendentals):
    """Mosaic scheduler hint; None when any term is symbolic (jax.export
    symbolic-batch tracing turns the products into _DimExpr, which
    CostEstimate rejects) — the kernel itself is unchanged, only the
    optional scheduling hint is dropped for that lowering."""
    vals = (flops, bytes_accessed, transcendentals)
    if not all(isinstance(v, int) for v in vals):
        return None
    return pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=transcendentals)

DEFAULT_BLOCK_Q = 512  # see scripts/bench_attention.py: bq512 ~2x XLA at S=1024
LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _pair_geometry(sq: int, sk: int, target: int = 512):
    """Shared block geometry of the packed pair kernels: q blocks target
    ``target`` rows (rounded to sublanes), the k/v sequence axis pads to
    sublanes only. The forward kernels use 1024-row blocks (measured
    fastest at the flagship decode shapes — scripts/bench_attn_defer4.py);
    the backward keeps 512 (its f32 dk/dv accumulators double the VMEM
    footprint)."""
    n_blocks = _cdiv(sq, target)
    block_q = _round_up(_cdiv(sq, n_blocks), 8)
    sq_pad = block_q * n_blocks
    sk_pad = _round_up(max(sk, 8), 8)
    return n_blocks, block_q, sq_pad, sk_pad


# ---------------------------------------------------------------------------
# Reference (XLA) attention — used on CPU, for keep_attn, and in tests.
# ---------------------------------------------------------------------------

def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        scale: Optional[float] = None) -> jax.Array:
    """softmax(q k^T * scale) v.

    Shapes: q [B, H, Sq, D], k/v [B, H, Sk, D] -> [B, H, Sq, D].
    Matches the manual path of reference Attention.forward
    (vision_transformer.py:68-75) with float32 softmax.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_probs(q: jax.Array, k: jax.Array,
                    scale: Optional[float] = None) -> jax.Array:
    """Explicit attention matrix (for keep_attn / explainability)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits * scale, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (batch*head, q_block) program: full-key softmax for a Q block."""
    q = q_ref[0]                      # [block_q, d]
    k = k_ref[0]                      # [sk_pad, d]
    v = v_ref[0]                      # [sk_pad, d]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                 # [block_q, sk_pad]
    logits *= scale

    sk_pad = logits.shape[-1]
    if kv_len < sk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)

    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, *, scale: float, kv_len: int):
    """dQ for one (batch*head, q_block) program, recomputing probs."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sk_pad = logits.shape[-1]
    if kv_len < sk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # [bq, sk] f32

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # [bq, sk]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale                        # [bq, sk] f32

    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, dk_ref, dv_ref, *,
                    scale: float, kv_len: int, q_len: int):
    """dK/dV for one (batch*head, k_block) program over all queries."""
    q = q_ref[0]                     # [sq_pad, d]
    k = k_ref[0]                     # [block_k, d]
    v = v_ref[0]
    do = do_ref[0]                   # [sq_pad, d]

    # logits^T block: [sq_pad, block_k]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    # For the softmax normalization we need row (query) stats over the FULL
    # key axis — recompute them against the full K held in VMEM.
    # Instead of passing full K twice, this kernel receives the full K/V via
    # k_ref when block_k == sk_pad (the common ViT-ED case).  The grid is
    # then (batch*heads,) and everything is a single program.
    sq_pad = logits.shape[0]
    if kv_len < logits.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
    if q_len < sq_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(row < q_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(s, 1e-30)                        # [sq_pad, block_k]
    if q_len < sq_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        p = jnp.where(row < q_len, p, 0.0)

    # dV = P^T dO
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # [sq_pad, block_k]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    # dK = dS^T Q
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _fwd_kernel_heads(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                      n_heads: int):
    """Variant: one program per (batch, q_block) computing ALL heads.

    Loads K/V for every head once per q block (fewer, larger DMAs and
    fewer program setups than the per-(batch, head) grid)."""
    for h in range(n_heads):
        q = q_ref[0, h]                  # [block_q, d]
        k = k_ref[0, h]                  # [sk_pad, d]
        v = v_ref[0, h]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        sk_pad = logits.shape[-1]
        if kv_len < sk_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < kv_len, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _pallas_fwd_heads(q, k, v, scale, kv_len, block_q, n_heads):
    b, h, sq_pad, d = q.shape
    _, _, sk_pad, _ = k.shape
    grid = (b, _cdiv(sq_pad, block_q))
    kernel = functools.partial(_fwd_kernel_heads, scale=scale, kv_len=kv_len,
                               n_heads=n_heads)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q, d), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk_pad, d), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, sk_pad, d), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
    )(q, k, v)


def fused_attention_heads(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: Optional[float] = None,
                          block_q: int = DEFAULT_BLOCK_Q) -> jax.Array:
    """Experimental heads-batched forward (no custom VJP; eval-only)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, sq, d = q.shape
    _, _, sk, _ = k.shape
    sq_pad = _round_up(max(sq, 8), min(block_q, LANE))
    sq_pad = _round_up(sq_pad, 8)
    sk_pad = _round_up(max(sk, LANE), LANE)
    block_q = min(block_q, sq_pad)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    out = _pallas_fwd_heads(q, k, v, scale, sk, block_q, h)
    return out[:, :, :sq, :]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pallas_fwd(q, k, v, scale, q_len, kv_len, block_q):
    bh, sq_pad, d = q.shape
    _, sk_pad, _ = k.shape
    grid = (bh, _cdiv(sq_pad, block_q))
    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
        cost_estimate=_cost(
            flops=4 * bh * sq_pad * sk_pad * d,
            bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=bh * sq_pad * sk_pad,
        ),
    )(q, k, v)


def _pallas_dq(q, k, v, do, scale, q_len, kv_len, block_q):
    bh, sq_pad, d = q.shape
    _, sk_pad, _ = k.shape
    grid = (bh, _cdiv(sq_pad, block_q))
    kernel = functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
    )(q, k, v, do)


def _pallas_dkv(q, k, v, do, scale, q_len, kv_len):
    bh, sq_pad, d = q.shape
    _, sk_pad, _ = k.shape
    grid = (bh,)
    kernel = functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len, q_len=q_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sq_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sk_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_INTERPRET,
    )(q, k, v, do)


# ---------------------------------------------------------------------------
# Public entry point with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_padded(q, k, v, scale_and_lens):
    scale, q_len, kv_len, block_q = scale_and_lens
    return _pallas_fwd(q, k, v, scale, q_len, kv_len, block_q)


def _fused_fwd(q, k, v, scale_and_lens):
    out = _fused_attention_padded(q, k, v, scale_and_lens)
    return out, (q, k, v)


def _fused_bwd(scale_and_lens, res, g):
    scale, q_len, kv_len, block_q = scale_and_lens
    q, k, v = res
    dq = _pallas_dq(q, k, v, g, scale, q_len, kv_len, block_q)
    dk, dv = _pallas_dkv(q, k, v, g, scale, q_len, kv_len)
    return dq, dk, dv


_fused_attention_padded.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_padded_v2(q, k, v, meta):
    """4-D [B, H, S, D] path: heads-batched forward kernel, per-(b,h)
    backward kernels (probs recomputed, so the forward variant is free to
    differ)."""
    scale, q_len, kv_len, block_q, n_heads = meta
    return _pallas_fwd_heads(q, k, v, scale, kv_len, block_q, n_heads)


def _fused_v2_fwd(q, k, v, meta):
    return _fused_attention_padded_v2(q, k, v, meta), (q, k, v)


def _fused_v2_bwd(meta, res, g):
    scale, q_len, kv_len, block_q, _n_heads = meta
    q, k, v = res
    b, h, sq_pad, d = q.shape
    sk_pad = k.shape[2]
    qf = q.reshape(b * h, sq_pad, d)
    kf = k.reshape(b * h, sk_pad, d)
    vf = v.reshape(b * h, sk_pad, d)
    gf = g.reshape(b * h, sq_pad, d)
    dq = _pallas_dq(qf, kf, vf, gf, scale, q_len, kv_len, block_q)
    dk, dv = _pallas_dkv(qf, kf, vf, gf, scale, q_len, kv_len)
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))


_fused_attention_padded_v2.defvjp(_fused_v2_fwd, _fused_v2_bwd)


# ---------------------------------------------------------------------------
# Head-pair packed attention: [B, S, H*64] in/out, no transposes.
# ---------------------------------------------------------------------------
#
# For head_dim 64 (the ViT-S family), splitting heads costs four XLA
# transposes per attention ([B,S,C] <-> [B,H,S,64]) — measured ~47% on top
# of the kernel at the patch16_512 decode shapes. This kernel keeps the
# model's natural [B, S, C] layout: each 128-lane group holds TWO heads,
# and per-head logits come from contracting q against a lane-MASKED k (the
# zeroed lanes contribute nothing to the dot product). Every matmul runs
# with full 128-wide operands, and the k/v sequence axis lives on
# SUBLANES, so Sk pads to a multiple of 8 instead of 128 (1025 -> 1032,
# not 1152).
#
# Softmax runs DEFERRED-NORMALIZED with an MXU-computed denominator
# (scripts/bench_attn_defer{2,4}.py, round 3):
# - the PV matmul's WASTED half-lanes carry the softmax denominator: V0
#   packs head-0 values in lanes 0..63 and a row-validity ones-column in
#   lane 64, so e @ V0 yields the unnormalized output AND s in one pass;
# - normalization divides the [bq, 128] result, not the [bq, sk] probs;
# - the max-subtraction is replaced by a static overflow clamp (outputs
#   are ratios — any finite bound keeps exp2 in range, and padded logit
#   columns contribute nothing because V0's pad rows are zero);
# - q is scaled by scale*log2(e) in-kernel (tiny [bq, 128] pass) and the
#   exponential is exp2.
# Measured (64, 6 heads, decode shapes) vs the max-subtracting
# full-normalization version: self 1024/1024 2712 -> 2135 us, self
# 1025/1025 3207 -> 2560 us, cross 1025/1024 2477 -> 2164 us. A no-softmax
# ablation runs 2107 us — this kernel is within ~3% of its own MXU floor,
# and the masked matmuls already run ~25% ABOVE the best XLA batched-GEMM
# rate at these shapes (scripts/bench_attn_shapes.py).

_EXP2_CLAMP = 80.0    # exp2(80) ~ 1.2e24: f32 sums stay far from overflow
_LOG2E = math.log2(math.e)


def _sum_column_values(v, kv_len):
    """Per-head V matrices with the denominator ones-column smuggled into
    the unused half-lanes (f32 build: i1 masks on bf16 hit a Mosaic
    relayout bug; the cast is one small pass)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    vf = v.astype(jnp.float32)
    ones_col = jnp.where(row < kv_len, 1.0, 0.0)
    v0 = (jnp.where(lane < 64, vf, 0.0)
          + jnp.where(lane == 64, ones_col, 0.0)).astype(v.dtype)
    v1 = (jnp.where(lane >= 64, vf, 0.0)
          + jnp.where(lane == 0, ones_col, 0.0)).astype(v.dtype)
    return v0, v1


def _pair_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]                     # [block_q, 128]  (heads 2g, 2g+1)
    k = k_ref[0]                     # [sk_pad, 128]
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k_lo = jnp.where(lane < 64, k, jnp.zeros_like(k))
    k_hi = jnp.where(lane >= 64, k, jnp.zeros_like(k))
    v0, v1 = _sum_column_values(v, kv_len)
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    def head(k_m, v_m):
        logits = jax.lax.dot_general(
            qs, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [bq, sk_pad]
        e = jnp.exp2(jnp.minimum(logits, _EXP2_CLAMP)).astype(v.dtype)
        return jax.lax.dot_general(
            e, v_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [bq, 128]

    d0 = head(k_lo, v0)    # lanes<64: unnormalized out, lane 64: s0
    d1 = head(k_hi, v1)    # lanes>=64: unnormalized out, lane 0: s1
    s0 = d0[:, 64:65]
    s1 = d1[:, 0:1]
    olane = jax.lax.broadcasted_iota(jnp.int32, d0.shape, 1)
    o = jnp.where(olane < 64, d0 / s0, d1 / s1)
    o_ref[0] = o.astype(o_ref.dtype)


def _pair_forward(q, k, v, scale):
    """q [B, Sq, C], k/v [B, Sk, C], C % 128 == 0, head_dim 64."""
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=1024)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, kv_len=sk),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
        cost_estimate=_cost(
            flops=8 * b * g * sq_pad * sk_pad * 128,
            bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=2 * b * g * sq_pad * sk_pad,
        ),
    )(q, k, v)
    return out[:, :sq, :]


# Fused head-pair packed BACKWARD: one kernel pass produces dQ, dK and dV
# directly on the [B, S, C] layout. Replaces the earlier transposing VJP
# (to_heads/pad-to-128/from_heads around the per-(b,h) dq and dkv
# kernels), which cost 7 MXU passes per head (probs recomputed twice),
# four layout transposes, and a 1025 -> 1152 sequence pad. Here the probs
# are recomputed ONCE and all three grads come out of 10 full-width
# masked dots per head pair (5 per head — the minimum for a recompute
# backward), with the k/v sequence axis on SUBLANES (1025 -> 1032).
# Measured on the flagship train step: attention fwd+bwd was 46% of the
# 150.7 ms step with the transposing VJP (xprof, docs/PERFORMANCE.md).

def _pair_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     dk_acc, dv_acc, *, scale: float, q_len: int,
                     kv_len: int, block_q: int):
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    q = q_ref[0]                     # [block_q, 128]  (heads 2g, 2g+1)
    k = k_ref[0]                     # [sk_pad, 128]
    v = v_ref[0]
    do = do_ref[0]                   # [block_q, 128]

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    sk_pad = k.shape[0]
    kv_lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    q_lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    # padded-q-row mask (only the trailing block has padded rows)
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 0) \
        + i * block_q

    def head(is_lo):
        k_m = jnp.where((kv_lane < 64) == is_lo, k, jnp.zeros_like(k))
        q_m = jnp.where((q_lane < 64) == is_lo, q, jnp.zeros_like(q))
        do_m = jnp.where((q_lane < 64) == is_lo, do, jnp.zeros_like(do))

        s = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, sk_pad]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)        # [bq, sk_pad] f32
        if q_len < nq * block_q:
            p = jnp.where(row < q_len, p, 0.0)

        dp = jax.lax.dot_general(
            do_m, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bq, sk_pad]
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale

        p_b = p.astype(v.dtype)
        ds_b = ds.astype(v.dtype)
        dq_part = jax.lax.dot_general(
            ds_b, k_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bq, 128]
        dv_acc[...] += jax.lax.dot_general(
            p_b, do_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [sk_pad, 128]
        dk_acc[...] += jax.lax.dot_general(
            ds_b, q_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_part

    dq_ref[0] = (head(True) + head(False)).astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pair_backward(q, k, v, do, scale):
    """Packed-layout attention backward: q/do [B, Sq, C], k/v [B, Sk, C]
    -> (dq, dk, dv) in the same layout. C % 128 == 0, head_dim 64."""
    b, sq, c = q.shape
    sk = k.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    kernel = functools.partial(_pair_bwd_kernel, scale=scale, q_len=sq,
                               kv_len=sk, block_q=block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda bi, gi, i: (bi, i, gi),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk_pad, 128), lambda bi, gi, i: (bi, 0, gi),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        # q blocks iterate fastest so the dk/dv accumulators cover one
        # (batch, head-pair) before the output block index changes
        grid=(b, g, n_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
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
        interpret=_INTERPRET,
        cost_estimate=_cost(
            flops=20 * b * g * sq_pad * sk_pad * 128,
            bytes_accessed=2 * (q.size + do.size) + 2 * (k.size + v.size),
            transcendentals=2 * b * g * sq_pad * sk_pad,
        ),
    )(q, k, v, do)
    return dq[:, :sq, :], dk[:, :sk, :], dv[:, :sk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_attention(q, k, v, meta):
    scale, n_heads = meta
    return _pair_forward(q, k, v, scale)


def _packed_fwd(q, k, v, meta):
    return _packed_attention(q, k, v, meta), (q, k, v)


def _packed_bwd(meta, res, g):
    """Backward on the packed layout via the fused _pair_backward kernel
    (dQ/dK/dV in one pass, no transposes — see the kernel's comment)."""
    scale, n_heads = meta
    q, k, v = res
    return _pair_backward(q, k, v, g, scale)


_packed_attention.defvjp(_packed_fwd, _packed_bwd)


# Fused-projection entry points: the qkv (or kv) Dense output feeds the
# kernel DIRECTLY — per-stream head-pair tiles are addressed by the
# BlockSpec index map on the lane dimension (all offsets are 128-aligned),
# so the jnp.split copies and the per-stream pads disappear from the HBM
# traffic (measured ~3.3 ms of a 42.8 ms patch16_512 decode call).

def _pair_forward_qkv(qkv, scale, kv_len):
    """qkv [B, S, 3C] (self-attention: q|k|v concatenated on lanes)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    g = c // 128

    n_blocks, block_q, s_pad, _ = _pair_geometry(s, s, target=1024)
    if s_pad != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, kv_len=kv_len),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 128),
                         lambda bi, i, gi, _g=g: (bi, 0, _g + gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 128),
                         lambda bi, i, gi, _g=g: (bi, 0, 2 * _g + gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), qkv.dtype),
        interpret=_INTERPRET,
    )(qkv, qkv, qkv)
    return out[:, :s, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _packed_attention_qkv(qkv, meta):
    scale, n_heads, kv_len = meta
    return _pair_forward_qkv(qkv, scale, kv_len)


def _packed_qkv_fwd(qkv, meta):
    return _packed_attention_qkv(qkv, meta), (qkv,)


def _packed_qkv_bwd(meta, res, g):
    scale, n_heads, kv_len = meta
    (qkv,) = res
    c = qkv.shape[-1] // 3
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    dq, dk, dv = _packed_bwd((scale, n_heads), (q, k, v), g)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_packed_attention_qkv.defvjp(_packed_qkv_fwd, _packed_qkv_bwd)


def _pair_forward_q_kv(q, kv, scale):
    """q [B, Sq, C], kv [B, Sk, 2C] (cross-attention: k|v on lanes)."""
    b, sq, c = q.shape
    sk = kv.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=1024)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - sk), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, kv_len=sk),
        grid=(b, n_blocks, g),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, i, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128),
                         lambda bi, i, gi, _g=g: (bi, 0, _g + gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda bi, i, gi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
    )(q, kv, kv)
    return out[:, :sq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _packed_attention_q_kv(q, kv, meta):
    scale, n_heads = meta
    return _pair_forward_q_kv(q, kv, scale)


def _packed_q_kv_fwd(q, kv, meta):
    return _packed_attention_q_kv(q, kv, meta), (q, kv)


def _packed_q_kv_bwd(meta, res, g):
    scale, n_heads = meta
    q, kv = res
    c = q.shape[-1]
    k, v = kv[..., :c], kv[..., c:]
    dq, dk, dv = _packed_bwd((scale, n_heads), (q, k, v), g)
    return dq, jnp.concatenate([dk, dv], axis=-1)


_packed_attention_q_kv.defvjp(_packed_q_kv_fwd, _packed_q_kv_bwd)


def _pair_forward_qkv_cls(qkv, scale):
    """Self-attention output for the FIRST (CLS) query row only, straight
    from the fused qkv projection [B, S, 3C] -> [B, 1, C].

    The pair head (ViTED.forward_head) consumes only the CLS token, so
    the LAST decoder block's self-attention needs just one query row; the
    k/v tiles still cover the full sequence. Same kernel math as the full
    pair kernel (the q block is the first 8 sublane rows; rows 1-7 are
    computed and discarded)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    g = c // 128

    sk_pad = _round_up(s, 8)
    if sk_pad != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, sk_pad - s), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, kv_len=s),
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda bi, gi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda bi, gi, _g=g: (bi, 0, _g + gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128),
                         lambda bi, gi, _g=g: (bi, 0, 2 * _g + gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda bi, gi: (bi, 0, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, c), qkv.dtype),
        interpret=_INTERPRET,
        cost_estimate=_cost(
            flops=8 * b * g * 8 * sk_pad * 128,
            bytes_accessed=2 * qkv.size // 3 * 2,
            transcendentals=2 * b * g * 8 * sk_pad,
        ),
    )(qkv, qkv, qkv)
    return out[:, :1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _packed_attention_qkv_cls(qkv, meta):
    scale, n_heads = meta
    return _pair_forward_qkv_cls(qkv, scale)


def _packed_qkv_cls_fwd(qkv, meta):
    return _packed_attention_qkv_cls(qkv, meta), (qkv,)


def _packed_qkv_cls_bwd(meta, res, g):
    """Backward via the fused pair-backward kernel at Sq=1 (the 8-row q
    block pads with zero rows, which contribute nothing to dK/dV — the
    kernel's q_len masking zeroes their probabilities). dQ scatters into
    row 0 of the full-length gradient; the other query rows received no
    cotangent, so their dQ is zero."""
    scale, n_heads = meta
    (qkv,) = res
    c = qkv.shape[-1] // 3
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    dq1, dk, dv = _pair_backward(q[:, :1], k, v, g, scale)
    dq = jnp.pad(dq1, ((0, 0), (0, q.shape[1] - 1), (0, 0)))
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_packed_attention_qkv_cls.defvjp(_packed_qkv_cls_fwd, _packed_qkv_cls_bwd)


def fused_attention_packed_qkv_cls(qkv: jax.Array, num_heads: int,
                                   scale: Optional[float] = None,
                                   use_pallas: Optional[bool] = None
                                   ) -> jax.Array:
    """CLS-query self-attention from the fused qkv projection [B, S, 3C]
    -> [B, 1, C]. Equals ``fused_attention_packed_qkv(qkv, ...)[:, :1]``
    without computing the other S-1 query rows. Differentiable (the
    training forward also short-circuits the last decoder block: only
    the CLS row carries gradient)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and s >= 256
    if use_pallas and d == 64 and c % 128 == 0:
        return _packed_attention_qkv_cls(qkv, (scale, num_heads))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return fused_attention_packed(q[:, :1], k, v, num_heads, scale=scale,
                                  use_pallas=use_pallas)


def _pair_forward_q_kv_shared(q, kv, scale):
    """q [B, Sq, C], kv [1, Sk, 2C] SHARED by every batch element.

    The O(N^2) scan's row-sharded schedule scores a whole chunk of pairs
    against ONE x1 row (parallel/pairs.py), so the context K/V is the
    same for every pair in the chunk. The kv BlockSpec ignores the batch
    coordinate and the batch axis runs INNERMOST in the grid, so Mosaic
    keeps each (head-pair) K/V tile resident in VMEM across the whole
    pair batch instead of re-fetching it per pair. Eval-only: no VJP
    (training never shares contexts across a batch)."""
    b, sq, c = q.shape
    sk = kv.shape[1]
    g = c // 128

    n_blocks, block_q, sq_pad, sk_pad = _pair_geometry(sq, sk, target=1024)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - sk), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, kv_len=sk),
        grid=(n_blocks, g, b),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda i, gi, bi: (bi, i, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128), lambda i, gi, bi: (0, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, 128),
                         lambda i, gi, bi, _g=g: (0, 0, _g + gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda i, gi, bi: (bi, i, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
        cost_estimate=_cost(
            flops=8 * b * g * sq_pad * sk_pad * 128,
            bytes_accessed=2 * (q.size + kv.size),
            transcendentals=2 * b * g * sq_pad * sk_pad,
        ),
    )(q, kv, kv)
    return out[:, :sq, :]


def fused_attention_packed_qkv(qkv: jax.Array, num_heads: int,
                               scale: Optional[float] = None,
                               use_pallas: Optional[bool] = None) -> jax.Array:
    """Self-attention straight from the fused qkv projection [B, S, 3C]."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and s >= 256
    if use_pallas and d == 64 and c % 128 == 0:
        return _packed_attention_qkv(qkv, (scale, num_heads, s))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return fused_attention_packed(q, k, v, num_heads, scale=scale,
                                  use_pallas=use_pallas)


def fused_attention_packed_kv_shared(q: jax.Array, kv: jax.Array,
                                     num_heads: int,
                                     scale: Optional[float] = None,
                                     use_pallas: Optional[bool] = None
                                     ) -> jax.Array:
    """Cross-attention where ONE context kv [1, Sk, 2C] serves the whole
    q batch [B, Sq, C] (the row-sharded O(N^2) scan chunk). Equivalent to
    ``fused_attention_packed_kv(q, broadcast_to(kv, [B, ...]))`` without
    materialising the broadcast. Eval-only (no VJP on the kernel path)."""
    b, sq, c = q.shape
    sk = kv.shape[1]
    d = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and sk >= 256
    if use_pallas and d == 64 and c % 128 == 0:
        return _pair_forward_q_kv_shared(q, kv, scale)
    kv_b = jnp.broadcast_to(kv, (b,) + kv.shape[1:])
    return fused_attention_packed_kv(q, kv_b, num_heads, scale=scale,
                                     use_pallas=use_pallas)


def fused_attention_packed_kv(q: jax.Array, kv: jax.Array, num_heads: int,
                              scale: Optional[float] = None,
                              use_pallas: Optional[bool] = None) -> jax.Array:
    """Cross-attention from q [B, Sq, C] and the fused kv projection
    [B, Sk, 2C]."""
    b, sq, c = q.shape
    sk = kv.shape[1]
    d = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and sk >= 256
    if use_pallas and d == 64 and c % 128 == 0:
        return _packed_attention_q_kv(q, kv, (scale, num_heads))
    k, v = jnp.split(kv, 2, axis=-1)
    return fused_attention_packed(q, k, v, num_heads, scale=scale,
                                  use_pallas=use_pallas)


def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int,
                           scale: Optional[float] = None,
                           use_pallas: Optional[bool] = None) -> jax.Array:
    """Multi-head attention on the natural [B, S, C] layout.

    Equivalent to split_heads -> fused_attention -> merge_heads, but for
    head_dim 64 on TPU it runs the head-pair packed kernel with no
    transposes. Other configurations fall back to the 4-D path.
    """
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and sk >= 256

    if use_pallas and d == 64 and c % 128 == 0:
        return _packed_attention(q, k, v, (scale, num_heads))

    def split(x, s):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    out = fused_attention(split(q, sq), split(k, sk), split(v, sk),
                          scale=scale, use_pallas=use_pallas)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, c)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    use_pallas: Optional[bool] = None) -> jax.Array:
    """Fused attention: softmax(q k^T * scale) v.

    Shapes: q [B, H, Sq, D], k/v [B, H, Sk, D] -> [B, H, Sq, D].
    Dispatches to the Pallas TPU kernel when running on TPU (or when forced
    via ``use_pallas``); otherwise uses the XLA reference path. The forward
    uses the heads-batched kernel (all heads of a (batch, q-block) program;
    ~25% faster than per-(batch, head) programs — scripts/bench_attention.py).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        # Short sequences (e.g. 64 tokens at patch8_64) fit XLA's batched-GEMM
        # attention better than a kernel launch per (batch, head); the Pallas
        # kernel pays off once the key axis is a few lanes wide.
        use_pallas = jax.default_backend() == "tpu" and k.shape[2] >= 256
    if not use_pallas:
        return reference_attention(q, k, v, scale)

    b, h, sq, d = q.shape
    _, _, sk, _ = k.shape
    sq_pad = _round_up(max(sq, 8), 128)
    sk_pad = _round_up(max(sk, LANE), LANE)
    if block_q is None:
        # bq512 wins when it divides the padded q axis; bq256 otherwise
        block_q = 512 if sq_pad % 512 == 0 else 256
    block_q = min(block_q, sq_pad)

    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    out = _fused_attention_padded_v2(q, k, v, (scale, sq, sk, block_q, h))
    return out[:, :, :sq, :]
