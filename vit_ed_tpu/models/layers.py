"""Shared Flax layers for the ViT family.

These re-create the timm building blocks the reference model relies on
(timm PatchEmbed / Mlp / DropPath, referenced from
/root/reference/models/vision_transformer.py:8) as idiomatic Flax modules
with a configurable compute dtype (bf16 on TPU) and f32 parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ed_tpu.ops.attention import (
    attention_probs,
    fused_attention,
    fused_attention_packed,
    fused_attention_packed_kv,
    fused_attention_packed_kv_shared,
    fused_attention_packed_qkv,
    fused_attention_packed_qkv_cls,
    reference_attention,
)
from vit_ed_tpu.ops.quant import QuantDense
from vit_ed_tpu.ops.ring_attention import ring_attention_shmap

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


# Exact (erf) GELU — torch nn.GELU default, unlike jax.nn.gelu's tanh.
# On the bf16 path this is the fast polynomial+exp-tail evaluation from
# ops/gelu.py, bit-exact vs jax.nn.gelu(approximate=False) for every bf16
# input (exhaustively verified in tests/test_gelu.py). XLA's own erfc
# lowering cost ~6.5 ms of a 42.8 ms patch16_512 decode call
# (docs/PERFORMANCE.md). TPU.FAST_GELU (tanh) remains as a deployment
# option; it deviates from exact by up to ~2 bf16 ulps mid-range.
from vit_ed_tpu.ops.gelu import gelu_exact


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchEmbed(nn.Module):
    """Conv patch embedding: NHWC image -> [B, T, D] tokens (timm PatchEmbed)."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] (NHWC — TPU-native layout)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class Mlp(nn.Module):
    """Two-layer MLP with exact GELU (timm Mlp)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    fast_gelu: bool = False
    # scoring-time dynamic-int8 GEMMs (ops/quant.py, TPU.INT8_SCORE)
    int8_gemm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dense = QuantDense if self.int8_gemm else nn.Dense
        x = dense(self.hidden_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                  name="fc1")(x)
        x = jax.nn.gelu(x, approximate=True) if self.fast_gelu else gelu_exact(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                  name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LayerScale(nn.Module):
    """Learned per-channel residual scaling (vision_transformer.py:203-210)."""

    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values), (self.dim,))
        return x * gamma.astype(x.dtype)


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _per_head_norm(x, num_heads, ln):
    """Per-head LayerNorm on the packed [B, N, C] layout (params identical
    to normalizing the [B, H, N, D] view: scale/bias of shape (head_dim,))."""
    b, n, c = x.shape
    d = c // num_heads
    return ln(x.reshape(b, n, num_heads, d)).reshape(b, n, c)


def _explicit_attention(mod, q, k, v, num_heads, dropout, keep_attn,
                        deterministic):
    """Reference manual path: explicit probabilities (sown for keep_attn)
    with dropout applied to them (vision_transformer.py:68-75).
    ``dropout`` is an nn.Dropout module (setup-defined callers cannot
    create submodules inline)."""
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    attn = attention_probs(qh, kh)
    if keep_attn:
        mod.sow("intermediates", "attn", attn)
    attn = dropout(attn, deterministic=deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh)
    return _merge_heads(out)


class Attention(nn.Module):
    """Multi-head self-attention (vision_transformer.py:13-80).

    When ``keep_attn`` the explicit attention matrix is computed, sown into
    the 'intermediates' collection (for Chefer-style relevancy rollout), and
    used for the output — matching the reference's manual path.

    NOTE: a non-zero ``attn_drop`` in training also takes the explicit
    path (the fused kernel has no prob-dropout), materialising the full
    [B, H, Sq, Sk] probabilities — correct but memory-heavy at large
    sequence lengths. All shipped configs use attn_drop 0.0.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    keep_attn: bool = False
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    # sequence-parallel attention: (Mesh, axis_name) — tokens sharded over
    # the axis, K/V blocks ring-rotated (ops/ring_attention.py). Set via
    # ViTED.ring_attn for token counts beyond one chip.
    ring: Optional[Any] = None
    # Megatron inner-region sharding under SP (+TP): a NamedSharding with
    # spec (data, None, model) anchoring the projection outputs — tokens
    # gathered, features head-sharded over the model axis — so GSPMD never
    # has to guess between the token-sharded block boundary and the
    # feature-sharded column-parallel kernels (ViTED._inner_sharding)
    inner_sharding: Optional[Any] = None
    # scoring-time dynamic-int8 GEMMs (ops/quant.py, TPU.INT8_SCORE)
    int8_gemm: bool = False

    def _anchor(self, t):
        if self.inner_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, self.inner_sharding)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, cls_only: bool = False):
        """``cls_only=True`` returns the attention output for the FIRST
        (CLS) query row only, [B, 1, C] — k/v still cover the full
        sequence. Used by the pair scan's last-decoder-block
        short-circuit (only the CLS row feeds the head)."""
        dense = QuantDense if self.int8_gemm else nn.Dense
        qkv = self._anchor(
            dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                  kernel_init=trunc_normal_init, name="qkv")(x))
        explicit = self.keep_attn or (self.attn_drop > 0.0 and not deterministic)
        if not explicit and self.ring is not None and not cls_only:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if self.qk_norm:
                q = _per_head_norm(q, self.num_heads,
                                   nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                                name="q_norm"))
                k = _per_head_norm(k, self.num_heads,
                                   nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                                name="k_norm"))
            mesh, axis = self.ring
            out = _merge_heads(ring_attention_shmap(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads), mesh, axis))
        elif not explicit and not self.qk_norm:
            # fused path: the kernel reads q/k/v tiles straight out of the
            # projection output (no split/pad copies)
            if cls_only:
                out = fused_attention_packed_qkv_cls(qkv, self.num_heads,
                                                     use_pallas=self.use_pallas)
            else:
                out = fused_attention_packed_qkv(qkv, self.num_heads,
                                                 use_pallas=self.use_pallas)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if self.qk_norm:
                q = _per_head_norm(q, self.num_heads,
                                   nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                                name="q_norm"))
                k = _per_head_norm(k, self.num_heads,
                                   nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                                name="k_norm"))
            if explicit:
                out = _explicit_attention(self, q, k, v, self.num_heads,
                                          nn.Dropout(self.attn_drop),
                                          self.keep_attn, deterministic)
            else:
                out = fused_attention_packed(q, k, v, self.num_heads,
                                             use_pallas=self.use_pallas)
            if cls_only:
                out = out[:, :1]

        # anchoring the pre-proj output pins the backward cotangents too —
        # without it GSPMD wavers on the transposed softmax/einsum ops
        out = dense(self.dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                    name="proj")(self._anchor(out))
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Q from the decoder stream, K/V from the encoder context
    (vision_transformer.py:130-200).

    Split into ``kv_for`` (the context-only K/V projection) and
    ``attend_kv`` (query projection + attention + output projection): the
    O(N^2) pair scan computes ``kv_for`` ONCE per x1 row and reuses it for
    every pair sharing that context (ViTED.context_kv_cache)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    keep_attn: bool = False
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    # sequence-parallel attention (Mesh, axis_name) — see Attention.ring
    ring: Optional[Any] = None
    # Megatron inner-region anchor under SP(+TP) — see Attention.inner_sharding
    inner_sharding: Optional[Any] = None
    # scoring-time dynamic-int8 GEMMs (ops/quant.py, TPU.INT8_SCORE)
    int8_gemm: bool = False

    def _anchor(self, t):
        if self.inner_sharding is None or t.shape[0] == 1:
            return t  # shared-kv rows [1, Sk, 2C] can't shard a size-1 batch
        return jax.lax.with_sharding_constraint(t, self.inner_sharding)

    def setup(self):
        dense = QuantDense if self.int8_gemm else nn.Dense
        self.q_dense = dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                             kernel_init=trunc_normal_init, name="q")
        self.kv_dense = dense(self.dim * 2, use_bias=self.qkv_bias,
                              dtype=self.dtype, kernel_init=trunc_normal_init,
                              name="kv")
        self.proj = dense(self.dim, dtype=self.dtype,
                          kernel_init=trunc_normal_init, name="proj")
        self.proj_dropout = nn.Dropout(self.proj_drop)
        self.attn_dropout = nn.Dropout(self.attn_drop)
        if self.qk_norm:
            self.q_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name="q_norm")
            self.k_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name="k_norm")

    def kv_for(self, context):
        """Fused K/V projection of the (already norm_context-ed) context."""
        return self._anchor(self.kv_dense(context))

    def attend_kv(self, x, kv, deterministic: bool = True):
        """Attention from the decoder stream against a precomputed kv."""
        q = self._anchor(self.q_dense(x))
        kv = self._anchor(kv)
        explicit = self.keep_attn or (self.attn_drop > 0.0 and not deterministic)
        if not explicit and self.ring is not None:
            k, v = jnp.split(kv, 2, axis=-1)
            if self.qk_norm:
                q = _per_head_norm(q, self.num_heads, self.q_norm)
                k = _per_head_norm(k, self.num_heads, self.k_norm)
            mesh, axis = self.ring
            out = _merge_heads(ring_attention_shmap(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads), mesh, axis))
        elif not explicit and not self.qk_norm:
            out = fused_attention_packed_kv(q, kv, self.num_heads,
                                            use_pallas=self.use_pallas)
        else:
            k, v = jnp.split(kv, 2, axis=-1)
            if self.qk_norm:
                q = _per_head_norm(q, self.num_heads, self.q_norm)
                k = _per_head_norm(k, self.num_heads, self.k_norm)
            if explicit:
                out = _explicit_attention(self, q, k, v, self.num_heads,
                                          self.attn_dropout, self.keep_attn,
                                          deterministic)
            else:
                out = fused_attention_packed(q, k, v, self.num_heads,
                                             use_pallas=self.use_pallas)

        out = self.proj(self._anchor(out))
        return self.proj_dropout(out, deterministic=deterministic)

    def attend_kv_shared(self, x, kv, deterministic: bool = True):
        """``attend_kv`` where ONE context kv [1, Sk, 2C] serves the whole
        batch (the row-sharded O(N^2) scan chunk — parallel/pairs.py).
        Exactly attend_kv(x, broadcast_to(kv, [B, ...])) without
        materialising the broadcast on the kernel path."""
        q = self._anchor(self.q_dense(x))
        explicit = self.keep_attn or (self.attn_drop > 0.0 and not deterministic)
        if not explicit and not self.qk_norm:
            out = fused_attention_packed_kv_shared(q, kv, self.num_heads,
                                                   use_pallas=self.use_pallas)
        else:
            # explain/qk_norm paths are not throughput-critical: reuse the
            # batched formulation on a materialised broadcast
            kv_b = jnp.broadcast_to(kv, (x.shape[0],) + kv.shape[1:])
            k, v = jnp.split(kv_b, 2, axis=-1)
            if self.qk_norm:
                q = _per_head_norm(q, self.num_heads, self.q_norm)
                k = _per_head_norm(k, self.num_heads, self.k_norm)
            if explicit:
                out = _explicit_attention(self, q, k, v, self.num_heads,
                                          self.attn_dropout, self.keep_attn,
                                          deterministic)
            else:
                out = fused_attention_packed(q, k, v, self.num_heads,
                                             use_pallas=self.use_pallas)
        out = self.proj(self._anchor(out))
        return self.proj_dropout(out, deterministic=deterministic)

    def __call__(self, x, context, deterministic: bool = True):
        return self.attend_kv(x, self.kv_for(context), deterministic)


class Block(nn.Module):
    """Pre-LN transformer encoder block (vision_transformer.py:83-127)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    keep_attn: bool = False
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    fast_gelu: bool = False
    ring: Optional[Any] = None  # sequence-parallel attention, see Attention.ring
    # Megatron inner-region anchor under SP(+TP) — see Attention.inner_sharding
    inner_sharding: Optional[Any] = None
    # sparse MLP: > 0 swaps the dense Mlp for a Switch-routed expert bank
    # (models/moe.py); encoder-only in practice (ViTED.moe_* knobs)
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_route_k: int = 1
    moe_jitter: float = 0.0
    # scoring-time dynamic-int8 GEMMs (ops/quant.py, TPU.INT8_SCORE)
    int8_gemm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, self.qkv_bias, self.qk_norm,
                      self.attn_drop, self.proj_drop, self.keep_attn,
                      self.use_pallas, self.dtype, ring=self.ring,
                      inner_sharding=self.inner_sharding,
                      int8_gemm=self.int8_gemm,
                      name="attn")(y, deterministic)
        if self.init_values:
            y = LayerScale(self.dim, self.init_values, name="ls1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.moe_experts > 0:
            from vit_ed_tpu.models.moe import MoeMlp

            y = MoeMlp(int(self.dim * self.mlp_ratio), self.dim,
                       self.moe_experts, self.moe_capacity, self.proj_drop,
                       self.dtype, self.fast_gelu, route_k=self.moe_route_k,
                       jitter=self.moe_jitter,
                       name="mlp")(y, deterministic)
        else:
            y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.proj_drop,
                    self.dtype, self.fast_gelu, int8_gemm=self.int8_gemm,
                    name="mlp")(y, deterministic)
        if self.init_values:
            y = LayerScale(self.dim, self.init_values, name="ls2")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x


class CrossBlock(nn.Module):
    """Decoder block: self-attn -> cross-attn(context) -> MLP
    (vision_transformer.py:213-272).

    Split into ``self_part`` (depends only on the decoder stream) and
    ``cross_mlp`` (consumes the context): the O(N^2) pair scan hoists
    block 0's ``self_part`` out of the pair loop — it is identical for
    every context paired with the same stream-2 tokens
    (ViTED.prepare_x2_scan / score_tokens_scan)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    keep_attn: bool = False
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    fast_gelu: bool = False
    ring: Optional[Any] = None  # sequence-parallel attention, see Attention.ring
    # Megatron inner-region anchor under SP(+TP) — see Attention.inner_sharding
    inner_sharding: Optional[Any] = None
    # scoring-time dynamic-int8 GEMMs (ops/quant.py, TPU.INT8_SCORE)
    int8_gemm: bool = False

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        self.attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                              self.qk_norm, self.attn_drop, self.proj_drop,
                              self.keep_attn, self.use_pallas, self.dtype,
                              ring=self.ring, int8_gemm=self.int8_gemm,
                              inner_sharding=self.inner_sharding, name="attn")
        self.norm_cross = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name="norm_cross")
        self.norm_context = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                         name="norm_context")
        self.cross_attn = CrossAttention(self.dim, self.num_heads,
                                         self.qkv_bias, self.qk_norm,
                                         self.attn_drop, self.proj_drop,
                                         self.keep_attn, self.use_pallas,
                                         self.dtype, ring=self.ring,
                                         inner_sharding=self.inner_sharding,
                                         int8_gemm=self.int8_gemm,
                                         name="cross_attn")
        self.norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                       self.proj_drop, self.dtype, self.fast_gelu,
                       int8_gemm=self.int8_gemm, name="mlp")
        if self.init_values:
            self.ls1 = LayerScale(self.dim, self.init_values, name="ls1")
            self.ls_cross = LayerScale(self.dim, self.init_values,
                                       name="ls_cross")
            self.ls2 = LayerScale(self.dim, self.init_values, name="ls2")
        self.drop_path1 = DropPath(self.drop_path, name="drop_path1")
        self.drop_path_cross = DropPath(self.drop_path, name="drop_path_cross")
        self.drop_path2 = DropPath(self.drop_path, name="drop_path2")

    def self_part(self, x, deterministic: bool = True):
        y = self.attn(self.norm1(x), deterministic)
        if self.init_values:
            y = self.ls1(y)
        return x + self.drop_path1(y, deterministic)

    def context_kv(self, context):
        """The context-only half of the cross-attention: norm_context +
        fused K/V projection. Depends only on the encoder features, so the
        O(N^2) scan computes it once per x1 row (ViTED.context_kv_cache)."""
        return self.cross_attn.kv_for(self.norm_context(context))

    def cross_mlp_kv(self, x, kv, deterministic: bool = True):
        """cross_mlp with a precomputed ``context_kv`` result."""
        y = self.cross_attn.attend_kv(self.norm_cross(x), kv, deterministic)
        if self.init_values:
            y = self.ls_cross(y)
        x = x + self.drop_path_cross(y, deterministic)

        y = self.mlp(self.norm2(x), deterministic)
        if self.init_values:
            y = self.ls2(y)
        return x + self.drop_path2(y, deterministic)

    def cross_mlp_kv_shared(self, x, kv, deterministic: bool = True):
        """``cross_mlp_kv`` with a single shared ``context_kv`` row
        [1, Sk, 2C] serving the whole batch (row-sharded pair scan)."""
        y = self.cross_attn.attend_kv_shared(self.norm_cross(x), kv,
                                             deterministic)
        if self.init_values:
            y = self.ls_cross(y)
        x = x + self.drop_path_cross(y, deterministic)

        y = self.mlp(self.norm2(x), deterministic)
        if self.init_values:
            y = self.ls2(y)
        return x + self.drop_path2(y, deterministic)

    def cls_self_part(self, x, deterministic: bool = True):
        """``self_part`` producing only the CLS row [B, 1, C].

        Valid ONLY for the last decoder block of a scoring pass: the head
        consumes just the CLS token, so every non-CLS row of this block's
        output is dead work (the k/v of the CLS query still cover the
        full sequence). The subsequent cross-attention + MLP then run on
        [B, 1, C] via the regular shared-kv methods."""
        y = self.attn(self.norm1(x), deterministic, cls_only=True)
        if self.init_values:
            y = self.ls1(y)
        return x[:, :1] + self.drop_path1(y, deterministic)

    def cross_mlp(self, x, context, deterministic: bool = True):
        return self.cross_mlp_kv(x, self.context_kv(context), deterministic)

    def cls_call(self, x, context, deterministic: bool = True):
        """Whole block producing only the CLS row [B, 1, C] (the
        last-decoder-block short-circuit; see ``cls_self_part``). Fully
        differentiable — in training only the CLS row carries gradient
        through the head, so the skipped rows' work is dead in both
        directions. DropPath rng draws are shape-identical to the full
        block's ((B, 1, 1) masks), so stochastic-depth training
        trajectories are unchanged."""
        x = self.cls_self_part(x, deterministic)
        return self.cross_mlp(x, context, deterministic)

    def __call__(self, x, context, deterministic: bool = True):
        return self.cross_mlp(self.self_part(x, deterministic), context,
                              deterministic)
