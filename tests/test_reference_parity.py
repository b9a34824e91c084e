"""Numerical parity vs the ACTUAL reference model file.

Imports /root/reference/models/vision_transformer.py itself (through the
vendored timm shim in tests/timm_shim), loads the Flax model's weights
into it with strict state-dict matching, and compares every calling mode.
Unlike tests/test_convert.py (a hand-written replica), a misreading of
the reference math cannot pass here.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vit_ed_tpu.models.convert import params_to_torch_state_dict
from vit_ed_tpu.models.vit_ed import ViTED

_REF = "/root/reference/models/vision_transformer.py"
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "timm_shim")

D, HEADS, DEPTH, CDEPTH, PATCH, IMG, NCLS = 64, 2, 2, 2, 16, 32, 4


@pytest.fixture(scope="module")
def ref_module():
    if not os.path.exists(_REF):
        pytest.skip("reference tree not available")
    sys.path.insert(0, _SHIM)
    try:
        spec = importlib.util.spec_from_file_location("ref_vit", _REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(_SHIM)
    return mod


def _models(ref_module, **kw):
    flax_model = ViTED(img_size=IMG, patch_size=PATCH, num_classes=NCLS,
                       embed_dim=D, depth=DEPTH, c_depth=CDEPTH,
                       num_heads=HEADS, use_pallas=False, **kw)
    variables = flax_model.init(jax.random.PRNGKey(3),
                                jnp.zeros((1, 2, IMG, IMG, 3)))
    params = jax.device_get(variables["params"])

    torch_model = ref_module.VisionTransformerCustom(
        img_size=IMG, patch_size=PATCH, num_classes=NCLS, embed_dim=D,
        depth=DEPTH, c_depth=CDEPTH, num_heads=HEADS,
        init_values=kw.get("init_values"),
        qk_norm=kw.get("qk_norm", False),
        keep_attn=kw.get("keep_attn", False))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_state_dict(params).items()}
    # strict load: every parameter name and shape must match the actual
    # reference module tree
    torch_model.load_state_dict(sd, strict=True)
    torch_model.eval()
    return flax_model, params, torch_model


def _rand_pair(seed, batch=2):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, 2, IMG, IMG, 3)).astype(np.float32)


def test_full_forward_matches_reference_module(ref_module):
    flax_model, params, torch_model = _models(ref_module)
    x = _rand_pair(0)
    out_flax = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x)),
                          np.float32)
    with torch.no_grad():
        out_torch = torch_model(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-4)


def test_encoder_and_decoder_modes_match(ref_module):
    flax_model, params, torch_model = _models(ref_module)
    x = _rand_pair(1)
    x1 = torch.from_numpy(x[:, 0]).permute(0, 3, 1, 2)
    x2 = torch.from_numpy(x[:, 1]).permute(0, 3, 1, 2)

    feats_flax = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(x[:, 0]), forward_first_part=True),
        np.float32)
    with torch.no_grad():
        feats_torch = torch_model(x1, forward_first_part=True)
    np.testing.assert_allclose(feats_flax, feats_torch.numpy(),
                               atol=2e-4, rtol=1e-4)

    out_flax = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(feats_flax), jnp.asarray(x[:, 1])),
        np.float32)
    with torch.no_grad():
        out_torch = torch_model(feats_torch, x2).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-4)


def test_keep_attn_matches_reference_module(ref_module):
    flax_model, params, torch_model = _models(ref_module, keep_attn=True)
    x = _rand_pair(2, batch=1)
    out_flax, state = flax_model.apply({"params": params}, jnp.asarray(x),
                                       mutable=["intermediates"])
    # grad mode on: the reference's keep_attn path registers a grad hook
    xt = torch.from_numpy(x).permute(0, 1, 4, 2, 3).requires_grad_(True)
    out_torch = torch_model(xt).detach().numpy()
    np.testing.assert_allclose(np.asarray(out_flax, np.float32), out_torch,
                               atol=2e-4, rtol=1e-4)

    # last cross-attention map captured by both implementations
    torch_attn = torch_model.cross_blocks[-1].cross_attn.get_attn() \
        .detach().numpy()
    inter = state["intermediates"]
    flax_attn = np.asarray(
        inter[f"cross_blocks_{CDEPTH - 1}"]["cross_attn"]["attn"][0], np.float32)
    np.testing.assert_allclose(flax_attn, torch_attn, atol=2e-4, rtol=1e-4)


def test_layerscale_variant_matches(ref_module):
    flax_model, params, torch_model = _models(ref_module, init_values=1e-3)
    x = _rand_pair(4)
    out_flax = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x)),
                          np.float32)
    with torch.no_grad():
        out_torch = torch_model(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-4)


def test_qk_norm_variant_matches(ref_module):
    flax_model, params, torch_model = _models(ref_module, qk_norm=True)
    x = _rand_pair(5)
    out_flax = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x)),
                          np.float32)
    with torch.no_grad():
        out_torch = torch_model(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-4)
