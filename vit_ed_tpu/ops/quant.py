"""Dynamic int8 quantized GEMM for the O(N^2) scoring path.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured on
this chip: 232 TOP/s int8 vs 148 TF/s bf16 on the decode GEMM chain,
docs/PERFORMANCE.md). The pairwise retrieval scan
(/root/reference/hisfrag.py:161-302) is inference-only, so its projection
GEMMs (qkv / kv / q / proj / fc1 / fc2) can run int8 with dynamic
activation scales while attention itself stays bf16 (in-kernel int8
attention measured slower — the d=64 contraction is latency-bound, not
throughput-bound).

Scheme (standard dynamic symmetric quantization):
  - weights: per-output-channel symmetric int8, scale = amax(col)/127,
    quantized inside jit from the same f32/bf16 checkpoint params the
    bf16 path uses (one elementwise pass over [D_in, D_out] per call —
    negligible next to the [rows, D_in] x [D_in, D_out] GEMM);
  - activations: per-row (per-token) symmetric int8;
  - accumulate int32 on the MXU, dequantize with the rank-1 outer product
    of the two scale vectors, add bias in f32.

``QuantDense`` declares parameters with nn.Dense's exact names and shapes
("kernel" [in, out], "bias" [out]) so a checkpoint trained with the bf16
model applies unchanged — int8 is a scoring-time flag (TPU.INT8_SCORE),
never a different checkpoint format. Gated by an mAP-parity test on
synthetic writer data (tests/test_quant.py), per the round-1 plan.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quantize_rows(x, axis=-1):
    """Symmetric per-row int8 quantization: returns (int8 values, f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x, kernel, bias=None, out_dtype=jnp.float32):
    """x [..., D_in] @ kernel [D_in, D_out] via int8 MXU with dynamic scales."""
    xq, sx = quantize_rows(x, axis=-1)                 # [..., D_in], [..., 1]
    wq, sw = quantize_rows(kernel, axis=0)             # [D_in, D_out], [1, D_out]
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * sw.reshape((1,) * (x.ndim - 1) + (-1,)))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense with an int8 MXU matmul.

    Identical parameter tree to nn.Dense (kernel/bias names, shapes, and
    initializers), so model variants with and without ``int8_gemm`` share
    checkpoints.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
