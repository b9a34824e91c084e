"""Torch checkpoint conversion: reference ViT-ED state dicts -> Flax params.

Maps the timm/VisionTransformerCustom parameter layout
(/root/reference/models/vision_transformer.py:275-420; keys like
``blocks.0.attn.qkv.weight``) onto this framework's module tree. Weight
layout changes:

- Linear: torch [out, in] -> flax kernel [in, out] (transpose)
- PatchEmbed conv: torch [D, C, kh, kw] -> flax [kh, kw, C, D]
- LayerNorm: weight/bias -> scale/bias
- qkv/kv fused projections keep their concatenation order (q|k|v rows in
  torch = output columns in flax; both implementations slice thirds and
  reshape to (heads, head_dim) identically)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w):
    return np.asarray(w).T


def _ln(prefix, sd):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _linear(prefix, sd):
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _attention(prefix, sd):
    out = {
        "qkv": _linear(prefix + ".qkv", sd),
        "proj": _linear(prefix + ".proj", sd),
    }
    if prefix + ".q_norm.weight" in sd:
        out["q_norm"] = _ln(prefix + ".q_norm", sd)
        out["k_norm"] = _ln(prefix + ".k_norm", sd)
    return out


def _cross_attention(prefix, sd):
    out = {
        "q": _linear(prefix + ".q", sd),
        "kv": _linear(prefix + ".kv", sd),
        "proj": _linear(prefix + ".proj", sd),
    }
    if prefix + ".q_norm.weight" in sd:
        out["q_norm"] = _ln(prefix + ".q_norm", sd)
        out["k_norm"] = _ln(prefix + ".k_norm", sd)
    return out


def _mlp(prefix, sd):
    return {"fc1": _linear(prefix + ".fc1", sd), "fc2": _linear(prefix + ".fc2", sd)}


def _block(prefix, sd):
    out = {
        "norm1": _ln(prefix + ".norm1", sd),
        "attn": _attention(prefix + ".attn", sd),
        "norm2": _ln(prefix + ".norm2", sd),
        "mlp": _mlp(prefix + ".mlp", sd),
    }
    if prefix + ".ls1.gamma" in sd:
        out["ls1"] = {"gamma": np.asarray(sd[prefix + ".ls1.gamma"])}
        out["ls2"] = {"gamma": np.asarray(sd[prefix + ".ls2.gamma"])}
    return out


def _cross_block(prefix, sd):
    out = _block(prefix, sd)
    out["norm_cross"] = _ln(prefix + ".norm_cross", sd)
    out["norm_context"] = _ln(prefix + ".norm_context", sd)
    out["cross_attn"] = _cross_attention(prefix + ".cross_attn", sd)
    if prefix + ".ls_cross.gamma" in sd:
        out["ls_cross"] = {"gamma": np.asarray(sd[prefix + ".ls_cross.gamma"])}
    return out


def torch_state_dict_to_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference ViT-ED (or plain timm ViT) state dict."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}

    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]
    w = sd["patch_embed.proj.weight"]
    params["patch_embed"] = {"proj": {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }}

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        params[f"blocks_{i}"] = _block(f"blocks.{i}", sd)
        i += 1
    i = 0
    while f"cross_blocks.{i}.norm1.weight" in sd:
        params[f"cross_blocks_{i}"] = _cross_block(f"cross_blocks.{i}", sd)
        i += 1

    params["norm"] = _ln("norm", sd)
    if "head.weight" in sd:
        params["head"] = _linear("head", sd)
    return params


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (for exporting checkpoints back to the reference)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = _t(p["kernel"])
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["pos_embed"] = np.asarray(params["pos_embed"])
    k = np.asarray(params["patch_embed"]["proj"]["kernel"])
    sd["patch_embed.proj.weight"] = np.transpose(k, (3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["proj"]["bias"])

    for name, p in params.items():
        if name.startswith("blocks_") or name.startswith("cross_blocks_"):
            if "mlp" in p and "w1" in p["mlp"]:
                raise ValueError(
                    f"{name} holds a MoE expert bank (models/moe.py), which "
                    f"has no reference/torch counterpart — only dense models "
                    f"export to .pth")
            stem, idx = name.rsplit("_", 1)
            prefix = f"{stem}.{idx}"
            put_ln(prefix + ".norm1", p["norm1"])
            put_linear(prefix + ".attn.qkv", p["attn"]["qkv"])
            put_linear(prefix + ".attn.proj", p["attn"]["proj"])
            if "q_norm" in p["attn"]:
                put_ln(prefix + ".attn.q_norm", p["attn"]["q_norm"])
                put_ln(prefix + ".attn.k_norm", p["attn"]["k_norm"])
            put_ln(prefix + ".norm2", p["norm2"])
            put_linear(prefix + ".mlp.fc1", p["mlp"]["fc1"])
            put_linear(prefix + ".mlp.fc2", p["mlp"]["fc2"])
            for ls in ("ls1", "ls2", "ls_cross"):
                if ls in p:
                    sd[f"{prefix}.{ls}.gamma"] = np.asarray(p[ls]["gamma"])
            if "cross_attn" in p:
                put_ln(prefix + ".norm_cross", p["norm_cross"])
                put_ln(prefix + ".norm_context", p["norm_context"])
                put_linear(prefix + ".cross_attn.q", p["cross_attn"]["q"])
                put_linear(prefix + ".cross_attn.kv", p["cross_attn"]["kv"])
                put_linear(prefix + ".cross_attn.proj", p["cross_attn"]["proj"])
                if "q_norm" in p["cross_attn"]:
                    put_ln(prefix + ".cross_attn.q_norm", p["cross_attn"]["q_norm"])
                    put_ln(prefix + ".cross_attn.k_norm", p["cross_attn"]["k_norm"])

    put_ln("norm", params["norm"])
    if "head" in params:
        put_linear("head", params["head"])
    return sd


def torch_checkpoint_to_params(path: str, config=None) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file and convert its model weights."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    sd = checkpoint.get("model", checkpoint)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return torch_state_dict_to_params(sd)
