"""Ring attention: sequence-parallel attention over a device mesh axis.

The long-context building block for model variants whose token counts
outgrow a single chip (e.g. pjs-L at 2048^2 / patch16 = 16k context
tokens): queries stay put, K/V blocks travel the ring.

Every device holds one sequence block of Q and one of K/V (the layout
sequence-parallel activations already have, models/vit_ed.py
``act_sharding``). Each of the ``ring_size`` steps computes the local
Q-block x resident K/V-block scores and folds them into a running online
softmax (the flash-attention recurrence, f32 accumulators), then rotates
the K/V block to the next device with ``ppermute`` — bitwise the same
collective XLA emits for a ring all-gather, but the full [Sq, Sk] score
matrix and the gathered K/V never exist on any chip:

    per-device memory  O(Sq/m * D + Sk/m * D)   vs  O(Sq/m * Sk)
    ICI traffic        one K/V block per step (overlaps the matmuls)

No reference counterpart (the reference is single-GPU SDPA,
/root/reference/models/vision_transformer.py:63-66); this is the
TPU-native answer to "context longer than one chip's HBM".

Numerics: accumulation and the softmax state are float32 regardless of
input dtype; the result equals ``reference_attention`` to f32 rounding
(tests/test_ring_attention.py, including cross-attention shapes and
uneven last blocks via padding).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "ring_attention_shmap"]

_NEG_INF = -1e30


def _ring_body(q, k, v, kv_valid, *, axis: str, scale: float):
    """shard_map body: q [B,H,bq,D] local; k/v [B,H,bk,D] resident block;
    kv_valid [bk] marks real (non-pad) K/V rows of the resident block."""
    ring = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    b, h, bq, d = q.shape
    q32 = q.astype(jnp.float32) * scale

    # the softmax state varies per device (each holds different queries):
    # mark the initial carry as axis-varying for shard_map's vma check
    def _vary(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis, to="varying")
        return jax.lax.pvary(x, axis)

    m0 = _vary(jnp.full((b, h, bq, 1), _NEG_INF, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, bq, 1), jnp.float32))
    acc0 = _vary(jnp.zeros((b, h, bq, d), jnp.float32))

    def step(carry, _):
        k_cur, v_cur, valid_cur, m_i, l_i, acc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
        s = jnp.where(valid_cur[None, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p,
                                       v_cur.astype(jnp.float32))
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        valid_nxt = jax.lax.ppermute(valid_cur, axis, perm)
        return (k_nxt, v_nxt, valid_nxt, m_new, l_new, acc), None

    (k_f, v_f, valid_f, m_f, l_f, acc), _ = jax.lax.scan(
        step, (k, v, kv_valid, m0, l0, acc0), None, length=ring)
    del k_f, v_f, valid_f, m_f, idx
    return (acc / l_f).astype(q.dtype)


def _pad_tokens(x, blocks):
    """Zero-pad the token axis (dim 2) up to a multiple of ``blocks``."""
    block = -(-x.shape[2] // blocks)
    pad = block * blocks - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def ring_attention_shmap(q: jax.Array, k: jax.Array, v: jax.Array,
                         mesh: Mesh, axis: str = "model",
                         scale: Optional[float] = None,
                         kv_len: Optional[int] = None) -> jax.Array:
    """The ring-attention computation itself — safe to call under an
    enclosing ``jit`` (the model path, ``ViTED.ring_attn``): no nested
    jit, no input placement; the shard_map in_specs establish the
    token sharding (a no-op when the activations already carry it, e.g.
    under ``ViTED.act_sharding``). ``kv_len`` marks how many K/V rows are
    real when the caller already padded the token axis (the standalone
    wrapper below); defaults to all of them."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    ring = mesh.shape[axis]
    sq, sk = q.shape[2], kv_len if kv_len is not None else k.shape[2]
    q_p, k_p, v_p = (_pad_tokens(t, ring) for t in (q, k, v))
    kv_valid = (jnp.arange(k_p.shape[2]) < sk)

    seq = P(None, None, axis, None)
    out = jax.shard_map(
        partial(_ring_body, axis=axis, scale=scale),
        mesh=mesh,
        in_specs=(seq, seq, seq, P(axis)),
        out_specs=seq,
    )(q_p, k_p, v_p, kv_valid)
    return out[:, :, :sq]


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis: str = "model",
                   scale: Optional[float] = None) -> jax.Array:
    """softmax(q k^T * scale) v with the sequence axis sharded over
    ``mesh``'s ``axis`` — queries resident, K/V blocks ring-rotated.

    Shapes: q [B, H, Sq, D], k/v [B, H, Sk, D] -> [B, H, Sq, D]; Sq and
    Sk are global lengths and may differ (cross-attention) and need not
    divide the ring size (blocks are zero-padded; pad K/V rows are masked
    out of the softmax, pad Q rows are sliced off). Standalone entry:
    places the (pre-padded) inputs token-sharded and jits the ring, so
    the result comes back sequence-sharded; use
    :func:`ring_attention_shmap` under an existing jit instead (the
    model path).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    ring = mesh.shape[axis]
    sq, sk = q.shape[2], k.shape[2]
    # pad OUTSIDE the jit so the placed inputs (and the jit output) shard
    # evenly over the token axis; slice eagerly after
    q_p, k_p, v_p = (_pad_tokens(t, ring) for t in (q, k, v))
    seq = P(None, None, axis, None)
    sharding = NamedSharding(mesh, seq)
    out = jax.jit(
        partial(ring_attention_shmap, mesh=mesh, axis=axis, scale=scale,
                kv_len=sk),
        in_shardings=(sharding,) * 3,
        out_shardings=sharding,
    )(q_p, k_p, v_p)
    return out[:, :, :sq]
