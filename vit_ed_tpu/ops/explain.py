"""Attention explainability: functional ViT-ED forward exposing attention
maps AND their gradients.

JAX-native replacement for the reference's ``keep_attn`` capture +
gradient hooks (models/vision_transformer.py:40-54, 72-74, 192-194,
consumed by scripts/visualise_attentions.py). Instead of module-side hooks,
the forward is expressed over the param tree with additive zero "probes"
on every attention matrix; ``jax.grad`` of the target logit w.r.t. the
probes IS the attention-gradient tensor the Chefer rules need.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x, p):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + 1e-6)
    return y * p["scale"] + p["bias"]


def _dense(x, p):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _attn(x, p, heads, probe):
    b, n, c = x.shape
    hd = c // heads
    qkv = _dense(x, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
    attn = attn + probe
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return _dense(out, p["proj"]), attn


def _cross(x, ctx, p, heads, probe):
    b, n, c = x.shape
    nc = ctx.shape[1]
    hd = c // heads
    q = _dense(x, p["q"]).reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    kv = _dense(ctx, p["kv"])
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, nc, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, nc, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
    attn = attn + probe
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return _dense(out, p["proj"]), attn


def _mlp(x, p):
    return _dense(jax.nn.gelu(_dense(x, p["fc1"]), approximate=False), p["fc2"])


def _patchify(x, p, patch):
    k = p["proj"]["kernel"]
    y = jax.lax.conv_general_dilated(
        x, k, (patch, patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["proj"]["bias"]
    b, h, w, d = y.shape
    return y.reshape(b, h * w, d)


def forward_with_probes(params: Dict, x_pair: jnp.ndarray, probes: Dict,
                        patch: int, heads: int, depth: int, c_depth: int
                        ) -> Tuple[jnp.ndarray, Dict]:
    """Full pair forward. probes: {'enc': [depth, ...], 'dec_self': ...,
    'dec_cross': ...} of zero tensors broadcastable to the attention maps.
    Returns (logits, attention maps)."""
    x1, x2 = x_pair[:, 0], x_pair[:, 1]
    attns = {"enc": [], "dec_self": [], "dec_cross": []}

    f = _patchify(x1, params["patch_embed"], patch) + params["pos_embed"][:, 1:]
    for i in range(depth):
        p = params[f"blocks_{i}"]
        y, a = _attn(_ln(f, p["norm1"]), p["attn"], heads, probes["enc"][i])
        attns["enc"].append(a)
        f = f + y
        f = f + _mlp(_ln(f, p["norm2"]), p["mlp"])

    t = _patchify(x2, params["patch_embed"], patch)
    cls = jnp.broadcast_to(params["cls_token"], (t.shape[0], 1, t.shape[-1]))
    t = jnp.concatenate([cls, t], axis=1) + params["pos_embed"]
    for i in range(c_depth):
        p = params[f"cross_blocks_{i}"]
        y, a = _attn(_ln(t, p["norm1"]), p["attn"], heads, probes["dec_self"][i])
        attns["dec_self"].append(a)
        t = t + y
        y, a = _cross(_ln(t, p["norm_cross"]), _ln(f, p["norm_context"]),
                      p["cross_attn"], heads, probes["dec_cross"][i])
        attns["dec_cross"].append(a)
        t = t + y
        t = t + _mlp(_ln(t, p["norm2"]), p["mlp"])

    t = _ln(t, params["norm"])
    logits = _dense(t[:, 0], params["head"])
    return logits, attns


def attention_maps_and_gradients(params, x_pair: np.ndarray, patch: int,
                                 heads: int, depth: int, c_depth: int,
                                 target_index: int = 0):
    """Compute attention maps and d(logit[target])/d(attention) for every
    attention matrix — the JAX equivalent of keep_attn + register_hook."""
    n1 = (x_pair.shape[2] // patch) * (x_pair.shape[3] // patch)
    n2 = n1 + 1
    b = x_pair.shape[0]

    def zeros(n_q, n_k):
        return jnp.zeros((b, heads, n_q, n_k))

    probes = {
        "enc": [zeros(n1, n1) for _ in range(depth)],
        "dec_self": [zeros(n2, n2) for _ in range(c_depth)],
        "dec_cross": [zeros(n2, n1) for _ in range(c_depth)],
    }

    def target(probes):
        logits, attns = forward_with_probes(params, jnp.asarray(x_pair), probes,
                                            patch, heads, depth, c_depth)
        return jnp.sum(logits[:, target_index]), attns

    (value, attns), grads = jax.value_and_grad(target, has_aux=True)(probes)
    return attns, grads, float(value)


# ---------------------------------------------------------------------------
# Chefer et al. relevancy rules (scripts/visualise_attentions.py:62-114)
# ---------------------------------------------------------------------------

def avg_heads(cam, grad):
    """Rule 5: head-average of grad-weighted positive attention."""
    cam = np.asarray(cam).reshape(-1, cam.shape[-2], cam.shape[-1])
    grad = np.asarray(grad).reshape(-1, grad.shape[-2], grad.shape[-1])
    return np.clip(grad * cam, 0, None).mean(axis=0)


def apply_self_attention_rules(R_ss, R_sq, cam_ss):
    """Rules 6+7."""
    return cam_ss @ R_ss, cam_ss @ R_sq


def handle_residual(orig_self_attention):
    """Eq. 8+9 normalization."""
    self_attention = orig_self_attention.copy()
    eye = np.eye(self_attention.shape[-1])
    self_attention = self_attention - eye
    self_attention = self_attention / np.maximum(
        self_attention.sum(axis=-1, keepdims=True), 1e-12)
    return self_attention + eye


def apply_mm_attention_rules(R_ss, R_qq, cam_sq, apply_normalization=True,
                             apply_self_in_rule_10=True):
    """Rule 10."""
    R_ss_n = handle_residual(R_ss) if apply_normalization else R_ss
    R_qq_n = handle_residual(R_qq) if apply_normalization else R_qq
    R_sq_addition = R_ss_n.T @ (cam_sq @ R_qq_n)
    if not apply_self_in_rule_10:
        R_sq_addition = cam_sq
    R_sq_addition[np.isnan(R_sq_addition)] = 0
    return R_sq_addition


def compute_rollout_attention(all_layer_matrices, start_layer=0):
    """Residual-aware attention rollout (visualise_attentions.py:62-73)."""
    num_tokens = all_layer_matrices[0].shape[1]
    eye = np.eye(num_tokens)
    mats = [m + eye for m in all_layer_matrices]
    mats = [m / m.sum(axis=-1, keepdims=True) for m in mats]
    joint = mats[start_layer]
    for i in range(start_layer + 1, len(mats)):
        joint = mats[i] @ joint
    return joint


def generate_relevance(params, x_pair, patch, heads, depth, c_depth,
                       target_index=0, normalize_self_attention=True,
                       apply_self_in_rule_10=True):
    """Full Chefer relevancy pipeline (generate_ours,
    visualise_attentions.py:200-244). Returns R_q_i[1:, :] — relevance of
    every decoder patch token to every encoder patch token."""
    attns, grads, _ = attention_maps_and_gradients(
        params, x_pair, patch, heads, depth, c_depth, target_index)

    n_i = attns["enc"][0].shape[-1]
    n_q = attns["dec_self"][0].shape[-1]
    R_i_i = np.eye(n_i)
    R_q_q = np.eye(n_q)
    R_q_i = np.zeros((n_q, n_i))

    for i in range(depth):
        cam = avg_heads(attns["enc"][i], grads["enc"][i])
        R_i_i = R_i_i + cam @ R_i_i

    for i in range(c_depth):
        cam = avg_heads(attns["dec_self"][i], grads["dec_self"][i])
        R_q_q_add, R_q_i_add = apply_self_attention_rules(R_q_q, R_q_i, cam)
        R_q_q = R_q_q + R_q_q_add
        R_q_i = R_q_i + R_q_i_add

        cam_q_i = avg_heads(attns["dec_cross"][i], grads["dec_cross"][i])
        R_q_i = R_q_i + apply_mm_attention_rules(
            R_q_q, R_i_i, cam_q_i,
            apply_normalization=normalize_self_attention,
            apply_self_in_rule_10=apply_self_in_rule_10)

    return R_q_i[1:, :]
