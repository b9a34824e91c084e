"""Mixture-of-Experts MLP (Switch top-1 routing, GShard dense dispatch).

Beyond reference parity: the reference model family is dense
(/root/reference/models/vision_transformer.py has a single Mlp per
block). For ViT-ED variants scaled past what dense FLOPs allow, this
module swaps the encoder MLP for a sparsely-activated expert bank the
TPU way — no data-dependent gathers or ragged shapes anywhere:

- routing is Switch-style top-1 with a STATIC per-expert capacity
  ``C = ceil(T/E * capacity_factor)``; over-capacity tokens are dropped
  (their residual passes through unchanged, the standard Switch rule);
- dispatch/combine are one-hot einsums onto a [B, T, E, C] tensor
  (GShard's formulation), so XLA sees three big static matmuls per
  bank and — with the expert-major tensors sharded over an ``expert``
  mesh axis (parallel/ep.py) — inserts the all-to-alls itself;
- the router runs in f32; the load-balance aux loss
  ``E * sum_e f_e * P_e`` (Switch eq. 4; 1.0 when perfectly balanced)
  is sown into the ``moe_aux`` collection — collected by the train
  step only when MOE.AUX_WEIGHT > 0, a silent no-op otherwise.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ed_tpu.models.layers import trunc_normal_init
from vit_ed_tpu.ops.gelu import gelu_exact

Dtype = Any


def collect_moe_aux(mutated, balance_weight: float, z_weight: float = 0.0):
    """Weighted sum of the ``moe_aux`` terms a training apply collected.

    ``load_balance`` sows are scaled by ``balance_weight`` (Switch's
    alpha, typically 1e-2), ``router_z`` sows by ``z_weight`` (ST-MoE's
    c_z, typically 1e-3). Returns a scalar f32 (0.0 when nothing sown).
    """
    total = jnp.zeros((), jnp.float32)
    leaves, _ = jax.tree_util.tree_flatten_with_path(
        mutated.get("moe_aux", {}))
    for path, leaf in leaves:
        names = [p.key for p in path if hasattr(p, "key")]
        w = z_weight if "router_z" in names else balance_weight
        total = total + w * jnp.asarray(leaf, jnp.float32).sum()
    return total


class MoeMlp(nn.Module):
    """Drop-in for ``layers.Mlp``: same (x, deterministic) call surface."""

    hidden_dim: int
    out_dim: int
    num_experts: int
    capacity_factor: float = 1.25
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    fast_gelu: bool = False
    # 1 = Switch (top-1, gate = router prob); 2 = GShard-style top-2 with
    # the two gates renormalized to sum to 1. Higher k works the same way.
    route_k: int = 1
    # multiplicative router-input jitter during training (Switch §2.2):
    # logits computed on x * U(1-jitter, 1+jitter); 0 disables
    jitter: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, d = x.shape
        e = self.num_experts
        k = self.route_k
        c = max(1, math.ceil(t / e * self.capacity_factor))

        # --- router (f32: softmax over expert logits must not saturate)
        router = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          kernel_init=trunc_normal_init, name="router")
        xr = x.astype(jnp.float32)
        if self.jitter > 0.0 and not deterministic:
            xr = xr * jax.random.uniform(self.make_rng("dropout"), xr.shape,
                                         jnp.float32, 1.0 - self.jitter,
                                         1.0 + self.jitter)
        logits = router(xr)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, k)               # [B, T, k]
        oh = jax.nn.one_hot(top_i, e, dtype=jnp.float32)     # [B, T, k, E]
        gates = top_p if k == 1 else top_p / jnp.sum(top_p, -1, keepdims=True)

        # load-balance loss on the FIRST choice (Switch eq. 4; GShard uses
        # the same first-choice fraction for its aux term)
        frac = jnp.mean(oh[:, :, 0, :], axis=(0, 1))         # [E]
        mean_p = jnp.mean(probs, axis=(0, 1))                # [E]
        self.sow("moe_aux", "load_balance", e * jnp.sum(frac * mean_p))
        # router z-loss (ST-MoE eq. 5): keeps the router logits from
        # drifting to magnitudes where bf16 softmax saturates
        self.sow("moe_aux", "router_z",
                 jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2))

        # --- static-capacity dispatch, k-major priority: every token's
        # first choice claims buffer slots before any second choice does
        # (GShard's rule); tokens past capacity are dropped for that
        # choice (their residual passes through unchanged)
        dispatch = jnp.zeros((b, t, e, c), jnp.float32)
        combine = jnp.zeros((b, t, e, c), jnp.float32)
        prev = jnp.zeros((b, 1, e), jnp.float32)             # slots already claimed
        for kk in range(k):
            ohk = oh[:, :, kk, :]                            # [B, T, E]
            pos = (jnp.cumsum(ohk, axis=1) - 1.0 + prev) * ohk  # [B, T, E]
            keep = (ohk > 0) & (pos >= 0) & (pos < c)
            pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), c,
                                    dtype=jnp.float32)       # [B, T, E, C]
            dk = pos_oh * keep[..., None]
            dispatch = dispatch + dk
            combine = combine + dk * gates[:, :, kk, None, None]
            prev = prev + jnp.sum(ohk, axis=1, keepdims=True)

        # --- expert bank [E, ...]: three static einsums; with the leaves
        # P("expert", ...)-sharded, GSPMD inserts the token all-to-alls
        w1 = self.param("w1", trunc_normal_init, (e, d, self.hidden_dim))
        b1 = self.param("b1", nn.initializers.zeros, (e, self.hidden_dim))
        w2 = self.param("w2", trunc_normal_init, (e, self.hidden_dim, self.out_dim))
        b2 = self.param("b2", nn.initializers.zeros, (e, self.out_dim))

        cdt = self.dtype
        expert_in = jnp.einsum("btec,btd->ebcd", dispatch.astype(cdt),
                               x.astype(cdt))                # [E, B, C, D]
        h = jnp.einsum("ebcd,edh->ebch", expert_in, w1.astype(cdt))
        h = h + b1.astype(cdt)[:, None, None, :]
        h = jax.nn.gelu(h, approximate=True) if self.fast_gelu else gelu_exact(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = jnp.einsum("ebch,ehd->ebcd", h, w2.astype(cdt))
        out = out + b2.astype(cdt)[:, None, None, :]

        y = jnp.einsum("btec,ebcd->btd", combine.astype(cdt), out)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)
