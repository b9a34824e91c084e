"""Pipeline parallelism (parallel/pp.py): the GPipe collective pipeline
must compute EXACTLY the sequential layer stack — outputs and parameter
gradients — with the layers genuinely stage-sharded over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_ed_tpu.models.layers import Block, CrossBlock
from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.parallel.mesh import create_mesh
from vit_ed_tpu.parallel.pp import (pipeline_apply, pp_param_specs,
                                    shard_params_pp, stack_layer_params,
                                    unstack_layer_params)

DIM, HEADS, DEPTH = 32, 4, 4


def _stacked_blocks(key=0):
    block = Block(DIM, HEADS, qkv_bias=True, use_pallas=False)
    x = jnp.zeros((2, 6, DIM))
    keys = jax.random.split(jax.random.PRNGKey(key), DEPTH)
    layers = [block.init(k, x)["params"] for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return block, layers, stacked


def _sequential(block, layers, xs):
    def fold(x):
        for p in layers:
            x = block.apply({"params": p}, x)
        return x

    return jnp.stack([fold(xs[i]) for i in range(xs.shape[0])])


@pytest.mark.parametrize("n_mb", [2, 4, 7])
def test_pipeline_matches_sequential(n_mb):
    """M microbatches (fewer than, equal to, and more than the stage
    count) through a 4-stage pipeline == the plain sequential stack."""
    block, layers, stacked = _stacked_blocks()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(n_mb, 2, 6, DIM)), jnp.float32)

    want = np.asarray(_sequential(block, layers, xs))

    mesh = create_mesh((4,), axis_names=("stage",),
                       devices=jax.devices()[:4])
    stacked = shard_params_pp(stacked, mesh)
    assert stacked["attn"]["qkv"]["kernel"].sharding.spec == P("stage")

    def layer_fn(p, x):
        return block.apply({"params": p}, x)

    got = jax.jit(lambda sp, s: pipeline_apply(layer_fn, sp, s, mesh))(
        stacked, xs)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    """Reverse-mode AD through the ring (backward ppermutes run the
    opposite direction) must give the sequential stack's param grads."""
    block, layers, stacked = _stacked_blocks()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(4, 2, 6, DIM)), jnp.float32)

    mesh = create_mesh((4,), axis_names=("stage",),
                       devices=jax.devices()[:4])

    def layer_fn(p, x):
        return block.apply({"params": p}, x)

    def loss_pp(sp):
        return jnp.sum(pipeline_apply(layer_fn, sp, xs, mesh) ** 2)

    def loss_seq(layers):
        return jnp.sum(_sequential(block, layers, xs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(shard_params_pp(stacked, mesh))
    g_seq = jax.grad(loss_seq)(layers)
    g_seq = jax.tree.map(lambda *xs: jnp.stack(xs), *g_seq)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4),
        g_pp, g_seq)


def test_pipeline_pytree_state_cross_blocks():
    """Decoder CrossBlocks pipeline with a (tokens, context) state pytree:
    the context rides the ring untouched while each stage's blocks
    cross-attend it."""
    cross = CrossBlock(DIM, HEADS, qkv_bias=True, use_pallas=False)
    tok = jnp.zeros((2, 5, DIM))
    ctx0 = jnp.zeros((2, 6, DIM))
    keys = jax.random.split(jax.random.PRNGKey(2), DEPTH)
    layers = [cross.init(k, tok, ctx0)["params"] for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.normal(size=(3, 2, 5, DIM)), jnp.float32)
    ctxs = jnp.asarray(rng.normal(size=(3, 2, 6, DIM)), jnp.float32)

    def fold(t, c):
        for p in layers:
            t = cross.apply({"params": p}, t, c)
        return t

    want = np.asarray(jnp.stack([fold(toks[i], ctxs[i]) for i in range(3)]))

    mesh = create_mesh((4,), axis_names=("stage",),
                       devices=jax.devices()[:4])

    def layer_fn(p, state):
        t, c = state
        return cross.apply({"params": p}, t, c), c

    got_t, _got_c = jax.jit(
        lambda sp, s: pipeline_apply(layer_fn, sp, s, mesh))(
            shard_params_pp(stacked, mesh), (toks, ctxs))
    np.testing.assert_allclose(np.asarray(got_t), want, atol=1e-5, rtol=1e-5)


def test_pipeline_compiles_to_collective_permute():
    """The compiled program must move activations with collective-permute
    (the ring), not gather the stage-sharded weights onto every device."""
    block, _layers, stacked = _stacked_blocks()
    mesh = create_mesh((4,), axis_names=("stage",),
                       devices=jax.devices()[:4])
    stacked = shard_params_pp(stacked, mesh)
    xs = jnp.zeros((4, 2, 6, DIM))

    def layer_fn(p, x):
        return block.apply({"params": p}, x)

    txt = (jax.jit(lambda sp, s: pipeline_apply(layer_fn, sp, s, mesh))
           .lower(stacked, xs).compile().as_text())
    assert "collective-permute" in txt
    assert "all-gather" not in txt, "stage weights gathered — PP defeated"


def test_stack_unstack_roundtrip_vited():
    """stack_layer_params/unstack_layer_params round-trip the real ViTED
    encoder param naming (blocks_0..blocks_{depth-1})."""
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=DIM,
                  depth=DEPTH, c_depth=2, num_heads=HEADS, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    stacked = stack_layer_params(params, "blocks_", DEPTH)
    assert stacked["attn"]["qkv"]["kernel"].shape[0] == DEPTH
    back = unstack_layer_params(stacked, "blocks_")
    for i in range(DEPTH):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            back[f"blocks_{i}"], params[f"blocks_{i}"])


def test_pipeline_vited_encoder_blocks():
    """The flagship use: ViTED's encoder blocks stage-sharded; pipeline
    output == ViTED.encode's block loop on the same tokens."""
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=DIM,
                  depth=DEPTH, c_depth=2, num_heads=HEADS, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]

    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.normal(size=(3, 2, 4, DIM)), jnp.float32)

    block = Block(DIM, HEADS, qkv_bias=True, use_pallas=False)

    def fold(x):
        for i in range(DEPTH):
            x = block.apply({"params": params[f"blocks_{i}"]}, x)
        return x

    want = np.asarray(jnp.stack([fold(toks[i]) for i in range(3)]))

    mesh = create_mesh((2,), axis_names=("stage",),
                       devices=jax.devices()[:2])
    stacked = shard_params_pp(stack_layer_params(params, "blocks_", DEPTH),
                              mesh)
    got = jax.jit(lambda sp, s: pipeline_apply(
        lambda p, x: block.apply({"params": p}, x), sp, s, mesh))(
            stacked, toks)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
