"""keep_attn capture: attention maps sown into intermediates
(reference Attention.save_attn hooks, vision_transformer.py:40-54)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.models.vit_ed import ViTED


def test_keep_attn_sows_maps():
    m = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
              depth=1, c_depth=1, num_heads=2, keep_attn=True, use_pallas=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out, state = m.apply(variables, x, mutable=["intermediates"])
    inter = state["intermediates"]
    # encoder block self-attn over 4 tokens
    enc_attn = inter["blocks_0"]["attn"]["attn"][0]
    assert enc_attn.shape == (2, 2, 4, 4)
    np.testing.assert_allclose(np.asarray(enc_attn).sum(-1), 1.0, atol=1e-5)
    # decoder self-attn over 5 tokens (CLS + 4), cross-attn 5 -> 4
    dec_self = inter["cross_blocks_0"]["attn"]["attn"][0]
    dec_cross = inter["cross_blocks_0"]["cross_attn"]["attn"][0]
    assert dec_self.shape == (2, 2, 5, 5)
    assert dec_cross.shape == (2, 2, 5, 4)


def test_keep_attn_output_matches_fused():
    """keep_attn (explicit attention) must produce the same logits as the
    fused path (reference fused/manual branch equivalence)."""
    kwargs = dict(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    m1 = ViTED(keep_attn=False, **kwargs)
    m2 = ViTED(keep_attn=True, **kwargs)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, 32, 32, 3)),
                    jnp.float32)
    variables = m1.init(jax.random.PRNGKey(0), x)
    out1 = m1.apply(variables, x)
    out2, _ = m2.apply(variables, x, mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
