"""ResNet backbone + MixConv aggregation baselines
(re-creates /root/reference/models/resnet.py in Flax).

BatchNorm uses ``axis_name='data'`` when run under a mesh-mapped training
step, which makes every norm a cross-replica SyncBatchNorm — the TPU
equivalent of ``torch.nn.SyncBatchNorm.convert_sync_batchnorm``
(models/build.py:53,62,72,80,91).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        return nn.BatchNorm(
            use_running_average=nn.merge_param(
                "use_running_average", self.use_running_average, use_running_average),
            momentum=self.momentum, epsilon=self.epsilon, dtype=self.dtype,
            use_scale=self.use_scale, use_bias=self.use_bias,
            axis_name=self.axis_name, name="bn")(x)


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(not train,
                                    axis_name=self.axis_name if train else None,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(not train,
                                    axis_name=self.axis_name if train else None,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


_ARCHS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 2048),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 2048),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 2048),
}


class ResNet(nn.Module):
    """Feature-map backbone (reference models/resnet.py:207-292).

    layers_to_crop removes trailing residual stages; freezing is handled by
    the optimizer mask, not the module (functional params)."""

    model_name: str = "resnet50"
    layers_to_crop: Sequence[int] = ()
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @property
    def out_channels(self) -> int:
        out = _ARCHS[self.model_name][2]
        out = out // 2 if 4 in self.layers_to_crop else out
        out = out // 2 if 3 in self.layers_to_crop else out
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_sizes, _ = _ARCHS[self.model_name]
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(not train, axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(stage_sizes):
            if stage + 1 in self.layers_to_crop:
                continue
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                x = block_cls(64 * 2 ** stage, strides, self.dtype, self.axis_name,
                              name=f"layer{stage + 1}_{b}")(x, train)
        return x


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class ResNetWrapper(nn.Module):
    """Global-pool + L2-normalized embedding (resnet.py:295-302)."""

    backbone: str = "resnet34"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNet(self.backbone, (), self.dtype, self.axis_name, name="model")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return _l2_normalize(x)


class StarReLU(nn.Module):
    """s * relu(x)^2 + b (resnet.py:42-59)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return scale * nn.relu(x) ** 2 + bias


class SepConv(nn.Module):
    """Inverted separable conv token mixer (resnet.py:62-89). NHWC in/out."""

    dim: int
    expansion_ratio: float = 2
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        med = int(self.expansion_ratio * self.dim)
        x = nn.Dense(med, use_bias=False, dtype=self.dtype, name="pwconv1")(x)
        x = StarReLU(name="act1")(x)
        x = nn.Conv(med, (self.kernel_size, self.kernel_size), padding=3,
                    feature_group_count=med, use_bias=False, dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="pwconv2")(x)
        return x


class MetaFormerMlp(nn.Module):
    dim: int
    mlp_ratio: float = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(int(self.mlp_ratio * self.dim), use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        x = StarReLU(name="act")(x)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        return x


class MetaFormerBlock(nn.Module):
    """resnet.py:119-161 with SepConv token mixing + LayerScale."""

    dim: int
    layer_scale_init_value: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = SepConv(self.dim, dtype=self.dtype, name="token_mixer")(y)
        ls1 = self.param("layer_scale1",
                         nn.initializers.constant(self.layer_scale_init_value),
                         (self.dim,))
        x = x + y * ls1
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MetaFormerMlp(self.dim, dtype=self.dtype, name="mlp")(y)
        ls2 = self.param("layer_scale2",
                         nn.initializers.constant(self.layer_scale_init_value),
                         (self.dim,))
        return x + y * ls2


class MixPool(nn.Module):
    """MetaFormer/SepConv token-mixing aggregation head (resnet.py:164-204).
    Input NHWC feature map -> L2-normalized embedding."""

    in_h: int
    in_w: int
    in_channels: int
    out_channels: int = 512
    mix_depth: int = 4
    out_rows: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.mix_depth):
            x = MetaFormerBlock(self.in_channels, dtype=self.dtype, name=f"mix_{i}")(x)
        b = x.shape[0]
        x = x.reshape(b, self.in_h * self.in_w, self.in_channels)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="channel_proj")(x)
        x = x.transpose(0, 2, 1)
        x = nn.Dense(self.out_rows, dtype=self.dtype, name="row_proj")(x)
        return _l2_normalize(x.reshape(b, -1))


class ResNet32MixConv(nn.Module):
    """ResNet backbone + MixPool aggregation (resnet.py:326-346)."""

    img_size: Tuple[int, int] = (512, 512)
    backbone: str = "resnet34"
    out_channels: int = 512
    mix_depth: int = 4
    out_rows: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bb = ResNet(self.backbone, (), self.dtype, self.axis_name, name="backbone")
        x = bb(x, train)
        h, w, c = x.shape[1], x.shape[2], x.shape[3]
        x = MixPool(h, w, c, self.out_channels, self.mix_depth, self.out_rows,
                    self.dtype, name="agg")(x)
        return _l2_normalize(x)


def build_resnet_model(config, model_type, dtype):
    if model_type == "resnet":
        return ResNetWrapper(backbone=config.MODEL.RES.ARCH, dtype=dtype,
                             axis_name=None)
    if model_type == "mixconv":
        return ResNet32MixConv(
            img_size=(config.DATA.IMG_SIZE, config.DATA.IMG_SIZE),
            backbone=config.MODEL.MIXCONV.ARCH,
            out_channels=config.MODEL.MIXCONV.OUT_CHANNELS,
            mix_depth=config.MODEL.MIXCONV.MIX_DEPTH,
            out_rows=config.MODEL.MIXCONV.OUT_ROWS,
            dtype=dtype)
    raise NotImplementedError(model_type)
