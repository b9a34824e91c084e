"""Bit-exact fast GELU for bfloat16.

The reference model uses torch's default exact-erf GELU
(/root/reference/models/vision_transformer.py via timm Mlp, act_layer
nn.GELU). The JAX equivalent, ``jax.nn.gelu(x, approximate=False)``,
computes ``(0.5 * x) * lax.erfc(-x * sqrt(0.5))`` — and on TPU the XLA
erfc lowering (exp + large polynomials + division + selects, evaluated on
the VPU) dominates the fc2 fusion of the patch16_512 decode call
(~6.5 ms/call, docs/PERFORMANCE.md).

This module replaces ``lax.erfc`` on the bf16 path with a short
polynomial-plus-exp-tail evaluation that is **bit-exact at op level**:
for every one of the 65536 bfloat16 bit patterns, ``erfc_bf16(u)`` equals
``lax.erfc(u)`` and ``gelu_exact(x)`` equals eagerly-executed
``jax.nn.gelu(x, approximate=False)`` (verified exhaustively in
tests/test_gelu.py). Bit-exactness is possible because bf16 has an 8-bit
mantissa: XLA's own bf16 erfc is computed in f32 and rounded once, so any
f32 approximation whose error stays below each value's distance to its
bf16 rounding boundary produces identical outputs.

Under ``jit``, bitwise identity is not a well-defined target: XLA's
excess-precision fusion keeps bf16 elementwise chains in f32 and flips
the last ulp on rounding-boundary inputs — the baseline itself differs
jit-vs-eager on ~1095 of 65536 inputs (measured). The jitted fast path
tracks the jitted baseline to within that ambiguity (<=1 input differing,
by one ulp; asserted in tests).

Structure (all f32 math, one final rounding to bf16):
  - central ``|u| <= 2.37``: erfc(u) = 1 - u * P(u^2), P a degree-10
    least-squares fit on Chebyshev nodes (max abs error ~1e-7 — bf16
    needs ~8e-6 at the tightest point, erfc(2.2) ~ 0.0019);
  - tail ``u > 2.2``: erfc(u) = exp(-u^2)/(u*sqrt(pi)) * S(1/u^2), S a
    degree-5 fit over u in [2.15, 9.7] (relative error ~1e-5 — bf16
    needs 2^-9). The exp tail is required because bf16's f32 exponent
    range represents erfc down to ~9e-41 (u ~ 9.6) and jax.nn.gelu
    produces those values (gelu(x) is nonzero down to x ~ -13);
  - ``u < -2.37``: erfc rounds to exactly 2.0 in bf16 (erfc(-2.37) =
    1.99918 > 2 - 2^-9), which the clamped central branch produces;
  - ``u > 9.6``: erfc < 4.6e-41 rounds to bf16 +0, which the clamped
    tail branch produces.

The elementwise chain is ~12 FMAs + one exp + one reciprocal + selects,
which XLA fuses into the surrounding matmul exactly like the erfc it
replaces, minus most of the VPU work.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Degree-10 fit of erf(u)/u in s = u^2 on Chebyshev nodes over |u| <= 2.37
# (leading coefficient is 2/sqrt(pi); see tests/test_gelu.py for the
# exhaustive verification that regenerating these is unnecessary).
_CENTRAL = (
    1.128379157327484,
    -0.37612594026672824,
    0.11283464216109934,
    -0.026856775950366136,
    0.005210026991203056,
    -0.0008425888303991454,
    0.00011372000286070129,
    -1.2396889892820672e-05,
    1.0108258427126519e-06,
    -5.356591074518983e-08,
    1.3534507450273756e-09,
)

# Degree-10 relative-accuracy fit of T(u) = erfc(u) * exp(u^2) in the
# scaled variable z = (u - 5.925) / 3.775 over u in [2.15, 9.7]. The
# scaled variable keeps f32 Horner conditioned (a monomial fit in u over
# this range loses ~3 digits to cancellation and fails the exhaustive
# check); the direct T(u) form needs NO reciprocal, unlike the classic
# exp(-u^2)/(u*sqrt(pi)) * S(1/u^2) factoring.
_TAIL = (
    0.09392002877070377,
    -0.05825032949372874,
    0.03565594311410055,
    -0.021452046041262322,
    0.012911018961654263,
    -0.008280547812929978,
    0.004570889044909737,
    -0.0011111130955624548,
    0.0009572567150144008,
    -0.0021086644129196842,
    0.0010474100578767717,
)
_TAIL_MU = 5.925
_TAIL_INV_SIG = 1.0 / 3.775

_UMAX = 2.37          # central clamp; erfc(-2.37) rounds to bf16 2.0
_TAIL_LO = 2.2        # branch point (inside both fits' valid ranges)
_TAIL_HI = 9.6        # erfc(9.6) < half the smallest bf16 subnormal
_LOG2E = float(np.log2(np.e))


def _horner(s, coefs):
    p = jnp.float32(coefs[-1])
    for c in coefs[-2::-1]:
        p = p * s + jnp.float32(c)
    return p


def _erfc_f32(uf):
    """The poly + exp2-tail erfc core: f32 in, f32 out (pre-rounding)."""
    uc = jnp.clip(uf, -_UMAX, _UMAX)
    central = 1.0 - uc * _horner(uc * uc, _CENTRAL)
    ut = jnp.clip(uf, _TAIL_LO, _TAIL_HI)
    z = (ut - jnp.float32(_TAIL_MU)) * jnp.float32(_TAIL_INV_SIG)
    tail = jnp.exp2((ut * ut) * jnp.float32(-_LOG2E)) * _horner(z, _TAIL)
    return jnp.where(uf > _TAIL_LO, tail, central)


def erfc_bf16(u):
    """bf16 -> bf16 erfc, bit-exact vs ``jax.lax.erfc`` on bfloat16.

    Exhaustively verified over all 65536 bf16 inputs (incl. +-inf, NaN)
    in tests/test_gelu.py.

    The tail uses exp2 (TPU's VPU exponential is hardware-assisted —
    a hand-rolled exp2 split with integer exponent bit-packing measured
    SLOWER, 794 vs 877 pairs/s decode; docs/PERFORMANCE.md), with log2(e)
    folded into the argument. Accuracy budget: the tail only needs
    ~2^-11 relative error (bf16 half-ulp with margin), far above f32
    exp2's.
    """
    return _erfc_f32(u.astype(jnp.float32)).astype(jnp.bfloat16)


_SQRT_HALF = float(np.sqrt(0.5))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


@jax.custom_jvp
def _gelu_bf16(x):
    sqrt_half = jnp.asarray(_SQRT_HALF, jnp.bfloat16)
    return (0.5 * x) * erfc_bf16(-x * sqrt_half)


@_gelu_bf16.defjvp
def _gelu_bf16_jvp(primals, tangents):
    """Derivative via the closed form gelu'(x) = Phi(x) + x * phi(x)
    instead of autodiff through the piecewise erfc evaluation.

    Autodiffing the polynomial/select chain roughly triples the VPU work
    of every fc2-backward fusion (xprof: ~0.94 ms per MLP layer at the
    flagship training shapes); the closed form reuses the same fast erfc
    core for Phi plus ONE exp2 for the Gaussian density — about forward
    cost. All gradient math runs in f32 (gradients have no bit-parity
    contract; the primal stays the bit-exact bf16 chain above).
    """
    (x,), (g,) = primals, tangents
    out = _gelu_bf16(x)
    xf = x.astype(jnp.float32)
    big_phi = 0.5 * _erfc_f32(-xf * jnp.float32(_SQRT_HALF))
    dens = jnp.exp2((xf * xf) * jnp.float32(-0.5 * _LOG2E)) \
        * jnp.float32(_INV_SQRT_2PI)
    grad = big_phi + xf * dens
    return out, (g.astype(jnp.float32) * grad).astype(x.dtype)


def gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default, unlike jax.nn.gelu's
    default tanh approximation.

    For bfloat16 inputs this is a bit-exact drop-in for
    ``jax.nn.gelu(x, approximate=False)`` — same value for every bf16
    input — reproducing its exact chain ``(0.5 * x) * erfc(-x * sqrt(.5))``
    (bf16 multiplies, erfc rounded to bf16) with the fast erfc above, and
    a closed-form custom derivative (see ``_gelu_bf16_jvp``).
    Other dtypes fall through to jax.nn.gelu unchanged.
    """
    if x.dtype != jnp.bfloat16:
        return jax.nn.gelu(x, approximate=False)
    return _gelu_bf16(x)
