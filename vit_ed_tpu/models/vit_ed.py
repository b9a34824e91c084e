"""ViT-ED ("pjs"): two-stream ViT encoder-decoder for pair scoring.

TPU-native re-design of /root/reference/models/vision_transformer.py:275-420:

- The three calling modes of the reference ``forward`` (full pair /
  encoder-only ``forward_first_part`` / decoder ``forward_second_part``)
  become separate pure methods dispatched via flax ``apply(..., method=...)``,
  so encode-once / decode-many pair mining (hisfrag.py:150-159) is a natural
  gather over encoder features.
- Images are NHWC and pairs are a leading axis [B, 2, H, W, C]; the stacked
  pair is unbound inside ``forward_features`` like the reference's
  ``torch.unbind(x, 1)`` (vision_transformer.py:407-410).
- Encoder stream 1 gets positional embeddings WITHOUT the CLS slot
  (``_pos_embed_no_cls``, vision_transformer.py:378-380); decoder stream 2
  is prepended with the CLS token and gets the full pos table
  (timm ``_pos_embed``).
- Attention runs through the fused Pallas kernel (ops/attention.py).
- ``TRAIN.USE_CHECKPOINT`` maps to jax.checkpoint (rematerialisation) over
  blocks, trading FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Block, CrossBlock, PatchEmbed, trunc_normal_init

Dtype = Any


class ViTED(nn.Module):
    """Vision Transformer Encoder-Decoder (model type "pjs")."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    c_depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    drop_rate: float = 0.0
    pos_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    keep_attn: bool = False
    # CLS short-circuit: every head-scoring path computes only the CLS
    # row of the last decoder block (mathematically identical; on TPU the
    # logits can shift by one bf16 ulp from the smaller kernel q-block).
    # Set False to bitwise-reproduce the full-path scores of converted
    # reference checkpoints (config: TPU.CLS_SHORTCUT). keep_attn also
    # disables it (rollout needs every block's full maps).
    cls_shortcut: bool = True
    use_pallas: Optional[bool] = None
    remat: bool = False
    fast_gelu: bool = False
    # Megatron-style sequence parallelism (beyond reference parity): a
    # NamedSharding for the [batch, tokens, channels] activations, e.g.
    # NamedSharding(mesh, P("data", "model", None)). Re-anchored at every
    # block boundary; with parallel/tp.py's column/row param sharding,
    # GSPMD turns the Megatron all-reduces into reduce-scatter +
    # all-gather pairs and the residual stream (plus its saved backward
    # activations) lives token-sharded — activation memory / model-axis.
    # Composes with the XLA attention path (see PARITY.md TP caveat).
    act_sharding: Optional[Any] = None
    # Ring attention on top of sequence parallelism (requires
    # act_sharding): attention itself runs sequence-parallel — K/V blocks
    # rotate the mesh's token axis via ppermute, so the full [Sq, Sk]
    # score matrix and a gathered K/V never exist on any chip
    # (ops/ring_attention.py). For token counts beyond one chip's HBM
    # (pjs-L / high-res variants); identical numerics to the fused path
    # up to f32 reduction order (tests/test_ring_attention.py).
    ring_attn: bool = False
    # Mixture-of-Experts encoder MLPs (beyond reference parity; the
    # reference family is dense). moe_experts > 0 swaps the MLP of every
    # moe_interval-th ENCODER block for a Switch-routed expert bank
    # (models/moe.py); the decoder stays dense so every pair-scan /
    # CLS-shortcut schedule is untouched. Shard the [E, ...] expert
    # leaves over an "expert" mesh axis with parallel/ep.py.
    moe_experts: int = 0
    moe_interval: int = 2
    moe_capacity: float = 1.25
    moe_route_k: int = 1      # 1 = Switch top-1, 2 = GShard top-2
    moe_jitter: float = 0.0   # router-input jitter during training
    # scoring-time dynamic-int8 GEMMs (ops/quant.py): the inference-only
    # O(N^2) scan may run its projection GEMMs int8 on the MXU with the
    # SAME checkpoint params (TPU.INT8_SCORE; gated by tests/test_quant.py)
    int8_gemm: bool = False
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                                      name="patch_embed")
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(stddev=1e-6),
                                    (1, 1, self.embed_dim))
        self.pos_embed = self.param("pos_embed", trunc_normal_init,
                                    (1, self.num_patches + 1, self.embed_dim))

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        dpr_cross = np.linspace(0, self.drop_path_rate, self.c_depth)

        block_cls = Block
        cross_cls = CrossBlock
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
            cross_cls = nn.remat(CrossBlock, static_argnums=(3,))

        ring = None
        if self.ring_attn:
            if self.act_sharding is None:
                raise ValueError("ring_attn requires act_sharding (the mesh "
                                 "and token axis come from its sharding)")
            ring = (self.act_sharding.mesh, self.act_sharding.spec[1])

        # Megatron inner-region anchor: between the block-boundary
        # token-sharded residual stream (act_sharding, spec [data, model,
        # None]) and the column/row-parallel attention kernels, the q/kv/qkv
        # projection outputs live tokens-GATHERED and features-HEAD-SHARDED
        # over the model axis — P(data, None, model). Anchoring them stops
        # GSPMD from involuntarily rematerialising the dot-generals when it
        # can't pick between the two layouts (MULTICHIP_r03 composed-phase
        # warnings). Ring attention instead keeps tokens sharded through
        # attention itself, so the anchor is off under ring_attn.
        inner = None
        if self.act_sharding is not None and not self.ring_attn:
            inner = jax.sharding.NamedSharding(
                self.act_sharding.mesh,
                jax.sharding.PartitionSpec(self.act_sharding.spec[0], None,
                                           self.act_sharding.spec[1]))

        def _moe(i):
            if self.moe_experts <= 0:
                return 0
            return self.moe_experts if i % self.moe_interval == self.moe_interval - 1 else 0

        self.blocks = [
            block_cls(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.qk_norm, self.proj_drop_rate, self.attn_drop_rate,
                      self.init_values, float(dpr[i]), self.keep_attn,
                      self.use_pallas, self.dtype, self.fast_gelu, ring=ring,
                      inner_sharding=inner, int8_gemm=self.int8_gemm,
                      moe_experts=_moe(i), moe_capacity=self.moe_capacity,
                      moe_route_k=self.moe_route_k,
                      moe_jitter=self.moe_jitter,
                      name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.cross_blocks = [
            cross_cls(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.qk_norm, self.proj_drop_rate, self.attn_drop_rate,
                      self.init_values, float(dpr_cross[i]), self.keep_attn,
                      self.use_pallas, self.dtype, self.fast_gelu, ring=ring,
                      inner_sharding=inner, int8_gemm=self.int8_gemm,
                      name=f"cross_blocks_{i}")
            for i in range(self.c_depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        self.head = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=trunc_normal_init, name="head")
        self.pos_drop = nn.Dropout(self.pos_drop_rate)
        self.head_drop = nn.Dropout(self.drop_rate)

    def _constrain(self, x):
        """Re-anchor a [B, S, C] activation to ``act_sharding`` (sequence
        parallelism); identity when the mode is off."""
        if self.act_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.act_sharding)

    def _embed(self, x):
        """Patch-embed with the conv region pinned under SP: the image is
        batch-sharded over the data axis and the token output is GATHERED
        along the model axis — the tokens-sharded transition happens at
        the explicit block-boundary anchor (a cheap slice) instead of
        inside the conv, where GSPMD otherwise wavers between batch- and
        spatial-partitioning it (involuntary-remat warnings in the
        composed-hybrid program, MULTICHIP_r03).

        uint8 images normalize ON DEVICE with the framework's canonical
        (x/255 - 0.5) / 0.5 (every transform's mean/std): the host then
        ships 4x fewer bytes per batch — the measured dominator of the
        tunneled-v5e train step (TPU.DEVICE_NORMALIZE; matches the host
        normalize to f32 rounding, XLA folds /255 into *(1/255))."""
        if x.dtype == jnp.uint8:
            x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        if self.act_sharding is None:
            return self.patch_embed(x)
        mesh, data = self.act_sharding.mesh, self.act_sharding.spec[0]
        P = jax.sharding.PartitionSpec
        x = jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh, P(data, None, None, None)))
        t = self.patch_embed(x)
        return jax.lax.with_sharding_constraint(
            t, jax.sharding.NamedSharding(mesh, P(data, None, None)))

    # ---------------------------------------------------------------- stream 1
    def _pos_embed_no_cls(self, x, deterministic):
        x = x + self.pos_embed[:, 1:].astype(x.dtype)
        return self.pos_drop(x, deterministic=deterministic)

    def embed_stream1(self, x1, train: bool = False):
        """``encode`` WITHOUT the blocks — patch-embed + pos for image 1.
        The pipeline-parallel train step (parallel/pp.py) applies this
        replicated, then runs the blocks stage-sharded."""
        det = not train
        return self._constrain(
            self._pos_embed_no_cls(self._embed(x1), det))

    def head_from_tokens(self, tokens, train: bool = False):
        """Final norm + CLS head over decoder output tokens — the
        replicated tail of the pipeline-parallel train step."""
        return self.forward_head(self.norm(tokens), train)

    def encode(self, x1, train: bool = False):
        """Encoder over image 1 without CLS (forward_first_part, L382-388)."""
        det = not train
        x1 = self.embed_stream1(x1, train)
        for blk in self.blocks:
            x1 = self._constrain(blk(x1, det))
        return x1

    # ---------------------------------------------------------------- stream 2
    def prepare_x2(self, x2, train: bool = False):
        """Patch-embed image 2 WITH CLS + full pos table (prepare_x2, L390-395)."""
        det = not train
        x2 = self._embed(x2)
        cls = jnp.broadcast_to(self.cls_token.astype(x2.dtype),
                               (x2.shape[0], 1, x2.shape[-1]))
        x2 = jnp.concatenate([cls, x2], axis=1)
        x2 = x2 + self.pos_embed.astype(x2.dtype)
        return self._constrain(self.pos_drop(x2, deterministic=det))

    def cross_part(self, x1_feats, x2_tokens, train: bool = False):
        """Decoder cross blocks + final norm (cross_part, L397-401)."""
        det = not train
        for blk in self.cross_blocks:
            x2_tokens = self._constrain(blk(x2_tokens, x1_feats, det))
        return self.norm(x2_tokens)

    def cross_part_cls(self, x1_feats, x2_tokens, train: bool = False):
        """``cross_part`` computing only the CLS row of the LAST block —
        [B, 1, C], the head's sole input.

        Every head-scoring forward (train AND eval) uses this when
        ``keep_attn`` is off: the last decoder block's full-sequence
        cross-attention, output projection and MLP feed nothing but the
        discarded non-CLS rows (~7.1 GF/pair forward, ~2x that backward
        at patch16_512), and in training those rows carry zero gradient.
        The CLS query still attends the full sequence, so the function
        computed is identical (CrossBlock.cls_call); ``keep_attn``
        (Chefer rollout needs every block's full attention maps) keeps
        the full path."""
        det = not train
        for blk in self.cross_blocks[:-1]:
            x2_tokens = self._constrain(blk(x2_tokens, x1_feats, det))
        # the last block's CLS row is [B, 1, C]: nothing left to shard
        x2_tokens = self.cross_blocks[-1].cls_call(x2_tokens, x1_feats, det)
        return self.norm(x2_tokens)

    def _head_scores(self, x1_feats, x2_tokens, train: bool = False):
        """Pair logits from decoder inputs — CLS-short-circuited unless
        keep_attn needs the full maps or ``cls_shortcut=False`` opts out
        (bit-parity re-evaluation of converted reference checkpoints)."""
        if not self._cls_last():
            return self.forward_head(self.cross_part(x1_feats, x2_tokens, train),
                                     train)
        return self.forward_head(self.cross_part_cls(x1_feats, x2_tokens, train),
                                 train)

    def decode(self, x1_feats, x2, train: bool = False):
        """forward_second_part (L403-405): raw image 2 + encoder features."""
        x2 = self.prepare_x2(x2, train)
        return self.cross_part(x1_feats, x2, train)

    # ---------------------------------------------------------------- heads
    def forward_head(self, x, train: bool = False):
        """CLS-token head (timm forward_head with global_pool='token')."""
        x = x[:, 0]
        x = self.head_drop(x, deterministic=not train)
        return self.head(x)

    def forward_features(self, x, train: bool = False):
        x1 = x[:, 0]
        x2 = x[:, 1]
        x1 = self.encode(x1, train)
        return self.decode(x1, x2, train)

    def decode_head(self, x1_feats, x2, train: bool = False):
        """Pair logits from precomputed encoder features (the O(N^2) eval
        inner op, hisfrag.py:225-229)."""
        x2 = self.prepare_x2(x2, train)
        return self._head_scores(x1_feats, x2, train)

    def score_tokens(self, x1_feats, x2_tokens, train: bool = False):
        """Pair logits from precomputed encoder features AND precomputed
        decoder input tokens — lets the sharded pairwise scan also amortise
        patch-embedding of stream 2."""
        return self._head_scores(x1_feats, x2_tokens, train)

    # -------------------------------------------------- O(N^2) scan methods
    def prepare_x2_scan(self, x2):
        """prepare_x2 ADVANCED through decoder block 0's self-attention.

        That sub-block depends only on the stream-2 tokens, so the pair
        scan would otherwise recompute it for every (x1, x2) pair; here it
        runs once per x2 batch. Eval-only (deterministic) by construction.
        Composes with ``score_tokens_scan``; together they are
        numerically identical to prepare_x2 + score_tokens (same ops in
        the same order, verified exactly in tests/test_model.py)."""
        tokens = self.prepare_x2(x2, train=False)
        return self.cross_blocks[0].self_part(tokens, deterministic=True)

    def _cls_last(self) -> bool:
        return self.cls_shortcut and not self.keep_attn

    def _scan_ladder(self, x, det, cross_fn):
        """Shared block ladder of the score_tokens_* variants: block 0's
        self-attention is hoisted into prepare_x2_scan; the last block is
        CLS-only when the short-circuit applies. ``cross_fn(blk, i, x)``
        applies block i's cross-attention + MLP (full context / gathered
        kv / shared kv — the only difference between the variants)."""
        blocks = self.cross_blocks
        for i, blk in enumerate(blocks):
            last = i == len(blocks) - 1 and self._cls_last()
            if i > 0:
                x = blk.cls_self_part(x, det) if last else blk.self_part(x, det)
            elif last:
                # single-block decoder: its self-attention is hoisted into
                # prepare_x2_scan and only the CLS row feeds the head
                x = x[:, :1]
            x = cross_fn(blk, i, x)
        return x

    def score_tokens_scan(self, x1_feats, x2_advanced, train: bool = False):
        """Pair logits from ``prepare_x2_scan`` outputs (the scan inner
        op). Like every head-scoring path, the last decoder block
        computes only the CLS row unless ``keep_attn`` /
        ``cls_shortcut=False`` need the full path."""
        det = not train
        x = self._scan_ladder(x2_advanced, det,
                              lambda blk, i, x: blk.cross_mlp(x, x1_feats, det))
        return self.forward_head(self.norm(x), train)

    def context_kv_cache(self, x1_feats):
        """Per-cross-block K/V projections of the encoder features,
        stacked [c_depth, B, Sk, 2C].

        Every decoder block's cross-attention consumes the SAME encoder
        features through its own norm_context + kv projection — work that
        depends only on x1. The O(N^2) scan computes this cache once per
        x1 row block; each pair then only runs the q projections,
        attention kernels, output projections and MLPs
        (``score_tokens_kv``), cutting ~7.2 GF of the 93.9 GF flagship
        per-pair decode. Composes exactly: context_kv_cache +
        score_tokens_kv == score_tokens_scan (tests/test_model.py)."""
        return jnp.stack([blk.context_kv(x1_feats)
                          for blk in self.cross_blocks])

    def score_tokens_kv(self, kv_cache, x2_advanced, train: bool = False):
        """Pair logits from a ``context_kv_cache`` slice (gathered per
        pair) and ``prepare_x2_scan`` outputs. CLS-short-circuited last
        block like every head-scoring path."""
        det = not train
        x = self._scan_ladder(
            x2_advanced, det,
            lambda blk, i, x: blk.cross_mlp_kv(x, kv_cache[i], det))
        return self.forward_head(self.norm(x), train)

    def score_tokens_row(self, kv_cache_row, x2_advanced, train: bool = False):
        """Pair logits for a chunk of pairs that all share ONE x1 row.

        ``kv_cache_row`` is ``context_kv_cache`` of a single encoder row
        [c_depth, 1, Sk, 2C]; ``x2_advanced`` is a ``prepare_x2_scan``
        batch [B, Sq, C]. This is the row-sharded O(N^2) scan schedule
        (parallel/pairs.py): because the production scan owns contiguous
        x1 rows and streams x2 columns, every pair chunk can share its
        row's context — the 12 norm_context + K/V projections (7.25 GF
        and ~100 MB of HBM streams per pair at patch16_512) run once per
        ROW instead of once per pair, and the attention kernel keeps the
        shared K/V tiles VMEM-resident across the chunk.

        Additionally the LAST decoder block computes only the CLS row
        (``CrossBlock.cls_self_part``): the head consumes just the CLS
        token, so the full-sequence cross-attention, output projection
        and MLP of the final block (~7.1 GF/pair at patch16_512) are
        dead work in a scoring pass. Equivalent to ``score_tokens_scan``
        with the row's features broadcast per pair (tests/test_model.py).
        Reference role: the inner pair loop of
        /root/reference/hisfrag.py:225-229."""
        det = not train
        x = self._scan_ladder(
            x2_advanced, det,
            lambda blk, i, x: blk.cross_mlp_kv_shared(x, kv_cache_row[i], det))
        return self.forward_head(self.norm(x), train)

    def __call__(self, x, x2=None, forward_first_part: bool = False,
                 train: bool = False):
        """Reference forward dispatch (vision_transformer.py:412-420):

        - ``forward_first_part=True``: x is a batch of images -> encoder feats
        - ``x2 is not None``: x is encoder feats, x2 raw images -> pair logits
        - else: x is a stacked pair [B, 2, H, W, C] -> pair logits
        """
        if forward_first_part:
            return self.encode(x, train)
        if x2 is not None:
            return self.decode_head(x, x2, train)
        x1 = self.encode(x[:, 0], train)
        return self.decode_head(x1, x[:, 1], train)
