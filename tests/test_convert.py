"""Numerical parity of the Flax ViT-ED with the reference PyTorch math via
checkpoint conversion (SURVEY.md §7 step 2: golden-output tests).

A minimal torch functional replica of the reference forward
(vision_transformer.py:378-420 semantics: pre-LN blocks, exact GELU,
no-CLS encoder stream, CLS+pos decoder stream, CLS-token head) is evaluated
against the converted Flax model on random weights and inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vit_ed_tpu.models.convert import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from vit_ed_tpu.models.vit_ed import ViTED

D, HEADS, DEPTH, CDEPTH, PATCH, IMG, NCLS = 32, 2, 2, 2, 16, 32, 4


def _torch_attn(x, sd, p, heads):
    B, N, C = x.shape
    qkv = torch.nn.functional.linear(x, sd[f"{p}.qkv.weight"], sd[f"{p}.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.unbind(0)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    x = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return torch.nn.functional.linear(x, sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"])


def _torch_cross_attn(x, ctx, sd, p, heads):
    B, N, C = x.shape
    _, NC, _ = ctx.shape
    q = torch.nn.functional.linear(x, sd[f"{p}.q.weight"], sd[f"{p}.q.bias"])
    kv = torch.nn.functional.linear(ctx, sd[f"{p}.kv.weight"], sd[f"{p}.kv.bias"])
    q = q.reshape(B, N, heads, C // heads).permute(0, 2, 1, 3)
    kv = kv.reshape(B, NC, 2, heads, C // heads).permute(2, 0, 3, 1, 4)
    k, v = kv.unbind(0)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    x = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return torch.nn.functional.linear(x, sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"])


def _ln(x, sd, p):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"],
                                          sd[f"{p}.bias"], eps=1e-6)


def _mlp(x, sd, p):
    x = torch.nn.functional.linear(x, sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"])
    x = torch.nn.functional.gelu(x)
    return torch.nn.functional.linear(x, sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"])


def _torch_forward(x_pair, sd):
    """Reference forward_features + forward_head (NCHW input)."""
    x1, x2 = x_pair[:, 0], x_pair[:, 1]

    def patchify(x):
        x = torch.nn.functional.conv2d(x, sd["patch_embed.proj.weight"],
                                       sd["patch_embed.proj.bias"], stride=PATCH)
        return x.flatten(2).transpose(1, 2)

    # stream 1: no CLS, pos_embed[:, 1:]
    f = patchify(x1) + sd["pos_embed"][:, 1:]
    for i in range(DEPTH):
        p = f"blocks.{i}"
        f = f + _torch_attn(_ln(f, sd, f"{p}.norm1"), sd, f"{p}.attn", HEADS)
        f = f + _mlp(_ln(f, sd, f"{p}.norm2"), sd, f"{p}.mlp")

    # stream 2: CLS + full pos table
    t = patchify(x2)
    cls = sd["cls_token"].expand(t.shape[0], -1, -1)
    t = torch.cat([cls, t], dim=1) + sd["pos_embed"]
    for i in range(CDEPTH):
        p = f"cross_blocks.{i}"
        t = t + _torch_attn(_ln(t, sd, f"{p}.norm1"), sd, f"{p}.attn", HEADS)
        t = t + _torch_cross_attn(_ln(t, sd, f"{p}.norm_cross"),
                                  _ln(f, sd, f"{p}.norm_context"),
                                  sd, f"{p}.cross_attn", HEADS)
        t = t + _mlp(_ln(t, sd, f"{p}.norm2"), sd, f"{p}.mlp")
    t = _ln(t, sd, "norm")
    return torch.nn.functional.linear(t[:, 0], sd["head.weight"], sd["head.bias"])


@pytest.fixture(scope="module")
def flax_model_and_params():
    model = ViTED(img_size=IMG, patch_size=PATCH, num_classes=NCLS, embed_dim=D,
                  depth=DEPTH, c_depth=CDEPTH, num_heads=HEADS, use_pallas=False)
    x = jnp.zeros((1, 2, IMG, IMG, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables["params"]


def test_roundtrip_conversion(flax_model_and_params):
    model, params = flax_model_and_params
    sd = params_to_torch_state_dict(jax.device_get(params))
    back = torch_state_dict_to_params(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    import flax

    flat_b = flax.traverse_util.flatten_dict(back)
    flat_a = flax.traverse_util.flatten_dict(jax.device_get(params))
    assert set(flat_a.keys()) == set(flat_b.keys())
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k))


def test_numerical_parity_with_torch_reference(flax_model_and_params):
    model, params = flax_model_and_params
    sd_np = params_to_torch_state_dict(jax.device_get(params))
    sd = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd_np.items()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 2, IMG, IMG, 3)).astype(np.float32)

    out_flax = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        x_t = torch.tensor(np.transpose(x, (0, 1, 4, 2, 3)))  # NHWC -> NCHW
        out_torch = _torch_forward(x_t, sd).numpy()

    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5, rtol=1e-4)


def test_encoder_parity(flax_model_and_params):
    model, params = flax_model_and_params
    sd_np = params_to_torch_state_dict(jax.device_get(params))
    sd = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd_np.items()}

    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    feats_flax = np.asarray(model.apply({"params": params}, jnp.asarray(x1),
                                        forward_first_part=True))
    with torch.no_grad():
        x_t = torch.tensor(np.transpose(x1, (0, 3, 1, 2)))
        f = torch.nn.functional.conv2d(x_t, sd["patch_embed.proj.weight"],
                                       sd["patch_embed.proj.bias"], stride=PATCH)
        f = f.flatten(2).transpose(1, 2) + sd["pos_embed"][:, 1:]
        for i in range(DEPTH):
            p = f"blocks.{i}"
            f = f + _torch_attn(_ln(f, sd, f"{p}.norm1"), sd, f"{p}.attn", HEADS)
            f = f + _mlp(_ln(f, sd, f"{p}.norm2"), sd, f"{p}.mlp")
    np.testing.assert_allclose(feats_flax, f.numpy(), atol=2e-5, rtol=1e-4)


def test_flagship_shape_roundtrip():
    """Strict round-trip at the REAL pjs-S patch16_512 layout (embed 384,
    depth 12+12, heads 6, 1025-token pos table, 1-logit head) — the
    published-checkpoint path exercised at the exact production shapes
    (reference models/build.py:15-32 + configs/hisfrag/hisfrag20_patch16_512.yaml).

    Parameter SHAPES come from jax.eval_shape (no 190-GF init forward);
    values are small random arrays, so equality failures pinpoint layout
    bugs (qkv fusion order, conv kernel transposes) rather than init noise.
    """
    import flax

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, use_pallas=False)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 2, 512, 512, 3))),
        jax.random.PRNGKey(0))["params"]

    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: np.asarray(rng.normal(size=s.shape), np.float32), shapes)
    assert params["pos_embed"].shape == (1, 1025, 384)
    assert params["cls_token"].shape == (1, 1, 384)
    assert params["head"]["kernel"].shape == (384, 1)

    sd = params_to_torch_state_dict(params)
    # the published-checkpoint layout: fused qkv/kv weights, torch [out, in]
    assert sd["blocks.11.attn.qkv.weight"].shape == (3 * 384, 384)
    assert sd["cross_blocks.11.cross_attn.kv.weight"].shape == (2 * 384, 384)
    assert sd["patch_embed.proj.weight"].shape == (384, 3, 16, 16)
    assert sd["pos_embed"].shape == (1, 1025, 384)

    back = torch_state_dict_to_params(sd)
    flat_a = flax.traverse_util.flatten_dict(params)
    flat_b = flax.traverse_util.flatten_dict(back)
    assert set(flat_a.keys()) == set(flat_b.keys())
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))
