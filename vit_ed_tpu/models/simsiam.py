"""SimSiam self-supervised baselines
(re-creates /root/reference/models/simsiam.py in Flax: torchvision ResNet
encoder + 3-layer projector + 2-layer predictor; V2 takes a single image;
V2CE adds a classifier head)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNet, _ARCHS

Dtype = Any


class _Projector(nn.Module):
    """3-layer projection MLP ending in affine-free BN
    (simsiam.py:40-49)."""

    dim: int
    prev_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        an = self.axis_name if train else None
        x = nn.Dense(self.prev_dim, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(not train, axis_name=an, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.prev_dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(not train, axis_name=an, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc3")(x)
        x = nn.BatchNorm(not train, axis_name=an, use_scale=False, use_bias=False,
                         dtype=self.dtype, name="bn3")(x)
        return x


class _Predictor(nn.Module):
    """2-layer prediction MLP (simsiam.py:52-55)."""

    dim: int
    pred_dim: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        an = self.axis_name if train else None
        x = nn.Dense(self.pred_dim, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(not train, axis_name=an, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class SimSiam(nn.Module):
    """Two-view SimSiam (simsiam.py:12-74): input [B, 2, H, W, C] ->
    (p1, p2, stop_grad(z1), stop_grad(z2))."""

    arch: str = "resnet34"
    dim: int = 2048
    pred_dim: int = 512
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.encoder_backbone = ResNet(self.arch, (), self.dtype, self.axis_name,
                                       name="encoder")
        prev_dim = _ARCHS[self.arch][2]
        self.projector = _Projector(self.dim, prev_dim, self.dropout, self.dtype,
                                    self.axis_name, name="projector")
        self.predictor = _Predictor(self.dim, self.pred_dim, self.dtype,
                                    self.axis_name, name="predictor")

    def encode(self, x, train: bool = False):
        f = self.encoder_backbone(x, train)
        f = jnp.mean(f, axis=(1, 2))
        return self.projector(f, train)

    def __call__(self, x, train: bool = False):
        x1 = x[:, 0]
        x2 = x[:, 1]
        z1 = self.encode(x1, train)
        z2 = self.encode(x2, train)
        p1 = self.predictor(z1, train)
        p2 = self.predictor(z2, train)
        return p1, p2, jax.lax.stop_gradient(z1), jax.lax.stop_gradient(z2)


class SimSiamV2(SimSiam):
    """Single-view variant (simsiam.py:77-81)."""

    def __call__(self, x, train: bool = False):
        z1 = self.encode(x, train)
        p1 = self.predictor(z1, train)
        return p1, jax.lax.stop_gradient(z1)


class SimSiamV2CE(nn.Module):
    """SimSiamV2 + classifier head (simsiam.py:84-138)."""

    arch: str = "resnet34"
    n_classes: int = 0
    dim: int = 2048
    pred_dim: int = 512
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.encoder_backbone = ResNet(self.arch, (), self.dtype, self.axis_name,
                                       name="encoder")
        prev_dim = _ARCHS[self.arch][2]
        self.projector = _Projector(self.dim, prev_dim, self.dropout, self.dtype,
                                    self.axis_name, name="fc")
        self.predictor = _Predictor(self.dim, self.pred_dim, self.dtype,
                                    self.axis_name, name="predictor")
        self._prev_dim = prev_dim

    @nn.compact
    def _classifier(self, x, train: bool):
        an = self.axis_name if train else None
        prev = self._prev_dim
        x = nn.Dense(prev, use_bias=False, dtype=self.dtype, name="cls_fc1")(x)
        x = nn.BatchNorm(not train, axis_name=an, dtype=self.dtype, name="cls_bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(prev // 2, use_bias=False, dtype=self.dtype, name="cls_fc2")(x)
        x = nn.BatchNorm(not train, axis_name=an, dtype=self.dtype, name="cls_bn2")(x)
        x = nn.relu(x)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="cls_fc3")(x)

    def __call__(self, x, train: bool = False):
        f = self.encoder_backbone(x, train)
        f = jnp.mean(f, axis=(1, 2))
        z1 = self.projector(f, train)
        p1 = self.predictor(z1, train)
        cls = self._classifier(f, train)
        return p1, jax.lax.stop_gradient(z1), cls


def build_simsiam(config, model_type, dtype):
    kwargs = dict(arch=config.MODEL.SS.ARCH, dim=config.MODEL.SS.EMBED_DIM,
                  pred_dim=config.MODEL.SS.PRED_DIM, dropout=config.MODEL.SS.DROPOUT,
                  dtype=dtype)
    if model_type == "ss":
        return SimSiam(**kwargs)
    if model_type == "ss2":
        return SimSiamV2(**kwargs)
    if model_type == "ss2ce":
        return SimSiamV2CE(n_classes=config.MODEL.SS.N_CLASSES, **kwargs)
    raise NotImplementedError(model_type)
