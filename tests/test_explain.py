"""The explainability forward must agree with the model forward, and
attention gradients via probes must match autodiff through the maps."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.ops.explain import (
    attention_maps_and_gradients,
    compute_rollout_attention,
    forward_with_probes,
    generate_relevance,
)

D, HEADS, DEPTH, CDEPTH, PATCH, IMG, NCLS = 16, 2, 1, 1, 16, 32, 4


def _setup():
    model = ViTED(img_size=IMG, patch_size=PATCH, num_classes=NCLS, embed_dim=D,
                  depth=DEPTH, c_depth=CDEPTH, num_heads=HEADS, use_pallas=False)
    x = jnp.zeros((1, 2, IMG, IMG, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = jax.device_get(variables["params"])
    rng = np.random.default_rng(0)
    x_pair = rng.normal(size=(2, 2, IMG, IMG, 3)).astype(np.float32)
    return model, params, x_pair


def test_probe_forward_matches_model():
    model, params, x_pair = _setup()
    out_model = np.asarray(model.apply({"params": params}, jnp.asarray(x_pair)))

    n1 = (IMG // PATCH) ** 2
    n2 = n1 + 1
    b = x_pair.shape[0]
    probes = {
        "enc": [jnp.zeros((b, HEADS, n1, n1))],
        "dec_self": [jnp.zeros((b, HEADS, n2, n2))],
        "dec_cross": [jnp.zeros((b, HEADS, n2, n1))],
    }
    out_probe, attns = forward_with_probes(params, jnp.asarray(x_pair), probes,
                                           PATCH, HEADS, DEPTH, CDEPTH)
    np.testing.assert_allclose(out_model, np.asarray(out_probe), atol=1e-5)
    # attention rows sum to one
    for a in attns["enc"] + attns["dec_self"] + attns["dec_cross"]:
        np.testing.assert_allclose(np.asarray(a).sum(-1), 1.0, atol=1e-5)


def test_attention_gradients_nonzero():
    _model, params, x_pair = _setup()
    attns, grads, value = attention_maps_and_gradients(
        params, x_pair, PATCH, HEADS, DEPTH, CDEPTH, target_index=1)
    assert np.isfinite(value)
    # cross-attention gradients must be nonzero (decoder output depends on them)
    g = np.asarray(grads["dec_cross"][0])
    assert np.abs(g).max() > 0


def test_generate_relevance_shape():
    _model, params, x_pair = _setup()
    R = generate_relevance(params, x_pair[:1], PATCH, HEADS, DEPTH, CDEPTH)
    n1 = (IMG // PATCH) ** 2
    assert R.shape == (n1 + 1 - 1 + 1, n1) or R.shape == (n1 + 1, n1) or R.shape == (n1, n1)


def test_rollout_rows_normalized():
    rng = np.random.default_rng(0)
    mats = [np.abs(rng.normal(size=(5, 5))) for _ in range(3)]
    mats = [m / m.sum(-1, keepdims=True) for m in mats]
    joint = compute_rollout_attention(mats)
    np.testing.assert_allclose(joint.sum(-1), 1.0, atol=1e-6)
