"""Plain ViT baseline (timm VisionTransformer equivalent).

Used by the reference as an embedding model for triplet training
(/root/reference/models/build.py:33-44, main_vit.py) with
``NUM_CLASSES`` = embedding dim.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Block, PatchEmbed, trunc_normal_init

Dtype = Any


class ViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
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
    use_pallas: Optional[bool] = None
    remat: bool = False
    fast_gelu: bool = False
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                                      name="patch_embed")
        self.cls_token = self.param("cls_token", nn.initializers.normal(stddev=1e-6),
                                    (1, 1, self.embed_dim))
        self.pos_embed = self.param("pos_embed", trunc_normal_init,
                                    (1, self.num_patches + 1, self.embed_dim))
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        self.blocks = [
            block_cls(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.qk_norm, self.proj_drop_rate, self.attn_drop_rate,
                      self.init_values, float(dpr[i]), False, self.use_pallas,
                      self.dtype, self.fast_gelu, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        self.head = nn.Dense(self.num_classes, dtype=self.dtype,
                             kernel_init=trunc_normal_init, name="head")
        self.pos_drop = nn.Dropout(self.pos_drop_rate)

    def forward_features(self, x, train: bool = False):
        det = not train
        if x.dtype == jnp.uint8:
            # on-device canonical normalize (see ViTED._embed): u8 wire,
            # 4x less host->device transfer (TPU.DEVICE_NORMALIZE)
            x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=det)
        for blk in self.blocks:
            x = blk(x, det)
        return self.norm(x)

    def __call__(self, x, train: bool = False):
        x = self.forward_features(x, train)
        return self.head(x[:, 0])
