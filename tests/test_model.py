import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.models.vit import ViT


@pytest.fixture(scope="module")
def tiny_model():
    m = ViTED(img_size=64, patch_size=32, num_classes=4, embed_dim=32,
              depth=2, c_depth=2, num_heads=2, use_pallas=False)
    x = jnp.zeros((2, 2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, variables


def test_forward_shapes(tiny_model):
    m, variables = tiny_model
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 64, 64, 3)), jnp.float32)
    out = m.apply(variables, x)
    assert out.shape == (2, 4)


def test_split_forward_matches_full(tiny_model):
    """forward == forward_second_part(forward_first_part) — the encode-once
    contract behind pair mining (reference vision_transformer.py:407-420)."""
    m, variables = tiny_model
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, 64, 64, 3)), jnp.float32)
    full = m.apply(variables, x)
    feats = m.apply(variables, x[:, 0], forward_first_part=True)
    assert feats.shape == (2, 4, 32)  # no CLS token in encoder stream
    split = m.apply(variables, feats, x[:, 1])
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-5)


def test_score_tokens_matches_decode(tiny_model):
    m, variables = tiny_model
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 2, 64, 64, 3)), jnp.float32)
    feats = m.apply(variables, x[:, 0], forward_first_part=True)
    logits_a = m.apply(variables, feats, x[:, 1])
    tokens = m.apply(variables, x[:, 1], method=ViTED.prepare_x2)
    logits_b = m.apply(variables, feats, tokens, method=ViTED.score_tokens)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), atol=1e-5)


def test_pair_asymmetry(tiny_model):
    """Scoring (a, b) must differ from (b, a) — directional labels depend
    on pair order."""
    m, variables = tiny_model
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 64, 64, 3)), jnp.float32)
    ab = m.apply(variables, x)
    ba = m.apply(variables, x[:, ::-1])
    assert not np.allclose(np.asarray(ab), np.asarray(ba))


def test_dropout_rngs():
    m = ViTED(img_size=64, patch_size=32, num_classes=4, embed_dim=32,
              depth=2, c_depth=2, num_heads=2, drop_path_rate=0.5, use_pallas=False)
    x = jnp.ones((4, 2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out1 = m.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = m.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    # stochastic depth should make train-mode outputs differ across rngs
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # eval mode is deterministic
    e1 = m.apply(variables, x)
    e2 = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_plain_vit():
    m = ViT(img_size=64, patch_size=32, num_classes=16, embed_dim=32,
            depth=1, num_heads=2, use_pallas=False)
    x = jnp.ones((2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 16)


def test_attn_drop_applied_in_training():
    """Non-zero attention dropout must change training-mode outputs
    (reference applies dropout to the probabilities in both paths;
    round-1 silently ignored it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_ed_tpu.models.layers import Attention

    attn = Attention(dim=32, num_heads=2, qkv_bias=True, attn_drop=0.5,
                     use_pallas=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)),
                    jnp.float32)
    params = attn.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, False)["params"]
    eval_out = attn.apply({"params": params}, x, True)
    train1 = attn.apply({"params": params}, x, False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    train2 = attn.apply({"params": params}, x, False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(train1), np.asarray(eval_out))
    assert not np.allclose(np.asarray(train1), np.asarray(train2))
    # deterministic mode ignores dropout entirely
    eval_out2 = attn.apply({"params": params}, x, True)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))


def test_fast_gelu_config_reaches_models():
    from vit_ed_tpu.config import default_config
    from vit_ed_tpu.models.build import build_model

    cfg = default_config()
    cfg.TPU.FAST_GELU = True
    cfg.MODEL.TYPE = "pjs"
    assert build_model(cfg).fast_gelu is True
    cfg.MODEL.TYPE = "vit"
    assert build_model(cfg).fast_gelu is True
    cfg.TPU.FAST_GELU = False
    assert build_model(cfg).fast_gelu is False


def test_scan_methods_equal_plain_path():
    """prepare_x2_scan + score_tokens_scan must reproduce prepare_x2 +
    score_tokens exactly (the O(N^2) scan hoists decoder block 0's
    self-attention out of the pair loop; same ops, same order)."""
    import jax
    import jax.numpy as jnp
    from vit_ed_tpu.models.vit_ed import ViTED

    for remat in (False, True):
        model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=64,
                      depth=1, c_depth=3, num_heads=2, init_values=1e-5,
                      use_pallas=False, remat=remat)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)

        feats = model.apply(variables, x[:, 0], forward_first_part=True)
        tokens = model.apply(variables, x[:, 1], method=model.prepare_x2)
        ref = model.apply(variables, feats, tokens, method=model.score_tokens)

        adv = model.apply(variables, x[:, 1], method=model.prepare_x2_scan)
        out = model.apply(variables, feats, adv, method=model.score_tokens_scan)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out)), remat

        # the cached-KV decomposition (context_kv_cache once per x1 row +
        # score_tokens_kv per pair) must also be exactly equivalent
        kv = model.apply(variables, feats, method=model.context_kv_cache)
        out_kv = model.apply(variables, kv, adv, method=model.score_tokens_kv)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_kv)), remat

        # the row-sharded decomposition (one shared x1 row per pair
        # chunk) must equal scoring each pair against that row
        for row in range(feats.shape[0]):
            kv_row = model.apply(variables, feats[row:row + 1],
                                 method=model.context_kv_cache)
            out_row = model.apply(variables, kv_row, adv,
                                  method=model.score_tokens_row)
            feats_b = jnp.broadcast_to(feats[row:row + 1],
                                       (adv.shape[0],) + feats.shape[1:])
            ref_row = model.apply(variables, feats_b, adv,
                                  method=model.score_tokens_scan)
            np.testing.assert_array_equal(np.asarray(ref_row),
                                          np.asarray(out_row)), (remat, row)


def test_u8_device_normalize_matches_host_normalize():
    """TPU.DEVICE_NORMALIZE contract: a uint8 image through the model
    equals the host-normalized f32 image — ViTED._embed normalizes on
    device with the canonical (x/255 - 0.5)/0.5 (and ViT likewise)."""
    import numpy as np

    from vit_ed_tpu.models.vit import ViT
    from vit_ed_tpu.models.vit_ed import ViTED

    rng = np.random.default_rng(3)
    xu8 = rng.integers(0, 256, (2, 2, 32, 32, 3), np.uint8)
    xf = (xu8.astype(np.float32) / 255.0 - 0.5) / 0.5

    m = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
              depth=1, c_depth=1, num_heads=2, use_pallas=False)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(xf))["params"]
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": p}, jnp.asarray(xu8))),
        np.asarray(m.apply({"params": p}, jnp.asarray(xf))),
        rtol=1e-5, atol=1e-6)

    v = ViT(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
            depth=1, num_heads=2, use_pallas=False)
    pv = v.init(jax.random.PRNGKey(0), jnp.asarray(xf[:, 0]))["params"]
    np.testing.assert_allclose(
        np.asarray(v.apply({"params": pv}, jnp.asarray(xu8[:, 0]))),
        np.asarray(v.apply({"params": pv}, jnp.asarray(xf[:, 0]))),
        rtol=1e-5, atol=1e-6)


def test_one_img_eval_emit_u8():
    """OneImgEval(emit_u8=True) returns the cropped uint8 array whose
    device-normalized value equals the f32 transform's output."""
    import numpy as np
    from PIL import Image

    from vit_ed_tpu.data.transforms import OneImgEval

    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 256, (80, 70, 3), np.uint8))
    f32 = OneImgEval(64, crop=True)(img)
    u8 = OneImgEval(64, crop=True, emit_u8=True)(img)
    assert u8.dtype == np.uint8 and u8.shape == (64, 64, 3)
    np.testing.assert_allclose(
        (u8.astype(np.float32) / 255.0 - 0.5) / 0.5, f32, atol=1e-6)
    # the pooled f32 prep is bypassed on the u8 wire
    assert OneImgEval(64, crop=True, emit_u8=True).pool_crop((80, 70)) is None
