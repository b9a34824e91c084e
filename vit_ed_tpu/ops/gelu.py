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
  - central ``|u| <= 2.37``: erfc(u) = 1 - u * P(u^2), P a degree-8
    least-squares fit on Chebyshev nodes, coefficient-refined by
    coordinate descent against the exhaustive oracle (the plain lstsq
    fit fails ONE of 65536 inputs; one-ulp coefficient nudges fix it —
    scripts/fit_gelu_poly.py ``--push``);
  - tail ``u > 2.2``: erfc(u) = exp(-u^2) * T(z), T a degree-8
    relative-accuracy fit of erfc(u)*exp(u^2) in the scaled variable
    z = (u - 5.925)/3.775 over u in [2.15, 9.7]. The asymptotic
    variable w = 1/u^2 passes the exhaustive check at degree THREE
    (S(w) is erfc's own asymptotic-series shape), but the f32 divide
    it needs measured SLOWER end-to-end than the seven Horner FMAs it
    saves (flagship decode 1,090.5 vs 1,101.0 pairs/s —
    scripts/bench_gelu_degree.py; TPU f32 division is a multi-pass VPU
    sequence). The exp tail is required because bf16's f32 exponent
    range represents erfc down to ~9e-41 (u ~ 9.6) and jax.nn.gelu
    produces those values (gelu(x) is nonzero down to x ~ -13);
  - ``u < -2.37``: erfc rounds to exactly 2.0 in bf16 (erfc(-2.37) =
    1.99918 > 2 - 2^-9), which the clamped central branch produces;
  - ``u > 9.6``: erfc < 4.6e-41 rounds to bf16 +0, which the clamped
    tail branch produces.

The elementwise chain is ~18 FMAs + one exp2 + selects (down from ~23 in
round 2), which XLA fuses into the surrounding matmul exactly like the
erfc it replaces, minus most of the VPU work. Measured on the flagship
decode (the GELU sits in every fc2 fusion): the round-5 degree
reduction alone is worth ~2% end-to-end (scripts/bench_gelu_degree.py,
same-day A/B: 1,079.7 -> 1,101.0 pairs/s for the 9/8 step; the shipped
8/8 adds one more FMA saving).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Degree-8 fit of erf(u)/u in s = u^2 on Chebyshev nodes over |u| <= 2.37
# (leading coefficient is 2/sqrt(pi)), coefficient-refined by oracle-
# guided coordinate descent to zero exhaustive mismatches
# (scripts/fit_gelu_poly.py --push; see tests/test_gelu.py for the
# exhaustive verification that regenerating these is unnecessary).
_CENTRAL = (
    1.1283787488937378,
    -0.37611010670661926,
    0.11274580657482147,
    -0.026676220819354057,
    0.005029051564633846,
    -0.0007404626230709255,
    7.929230196168646e-05,
    -5.369741757021984e-06,
    1.6877005748483498e-07,
)

# Degree-8 relative-accuracy fit of T(u) = erfc(u) * exp(u^2) in the
# scaled variable z = (u - 5.925) / 3.775 over u in [2.15, 9.7] (down
# from the round-2 degree 10; scripts/fit_gelu_poly.py). The scaled
# variable keeps f32 Horner conditioned AND needs no division — the
# divide of the otherwise-optimal asymptotic w = 1/u^2 form measured
# slower than the seven FMAs it saves (see module docstring).
_TAIL = (
    0.09391770142781804,
    -0.058192865893360105,
    0.03570651911739498,
    -0.022298662314569763,
    0.012920640648579028,
    -0.005017068929615902,
    0.003624703771738232,
    -0.005682589151180357,
    0.0028841162427360985,
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
