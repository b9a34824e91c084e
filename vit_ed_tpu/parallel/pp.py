"""Pipeline parallelism: a GPipe microbatch pipeline over a ``stage``
mesh axis (shard_map + ppermute collective pipeline).

Beyond reference parity (the reference is single-GPU DDP only,
/root/reference/misc/utils.py:319-344): this is the TPU answer for model
variants whose *weights* outgrow one chip — the depth axis is sharded
over a ``stage`` mesh axis, each device holds ``depth / n_stages``
transformer blocks, and microbatches flow stage-to-stage over ICI with
``ppermute`` (the scaling-book collective-pipeline recipe). Nothing is
hand-scheduled: the whole schedule is one ``lax.scan`` inside one
``shard_map``, fully differentiable (reverse-mode AD pipelines the
backward in the opposite ring direction automatically).

Layout
  stacked params   leaf [depth, ...]      sharded P("stage")  ->
                   per-device [depth/S, ...]
  microbatch stream  [M, *state]          replicated (each stage reads
                   only its own slot; a production run at scale would
                   additionally shard the stream over a data axis — the
                   two compose, see tests/test_pp.py's 2-D mesh case)

Schedule (GPipe): T = M + S - 1 ring steps; at step t, stage s runs
microbatch t - s (idle otherwise — the (S-1)/T bubble), then the ring
rotates every in-flight activation one stage forward. The state is an
arbitrary pytree, so decoder CrossBlocks pipeline too: carry
(tokens, context) and let the layer update the tokens.

The forward/backward math is EXACTLY the sequential stack's (no
recompute tricks, f32-identical on CPU; tests/test_pp.py asserts both
outputs and parameter gradients against the plain loop).

When to use: pjs-S..B fit one chip thousands of times over, so DP over
pairs + TP/SP dominate at every scale this framework ships (see the
dryrun docstring). PP becomes the right tool when a single stage's
weights + optimizer state exceed one chip's HBM at depth >> width —
this module is that capability, measured and tested, not the default.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "stack_layer_params",
    "unstack_layer_params",
    "pp_param_specs",
    "shard_params_pp",
    "pipeline_apply",
]


def _vary(tree, axis: str):
    """Mark a pytree as varying over ``axis`` for shard_map's vma check."""

    def one(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis, to="varying")
        return jax.lax.pvary(x, axis)

    return jax.tree.map(one, tree)


def stack_layer_params(params: Any, prefix: str, depth: int) -> Any:
    """Stack per-layer flax param subtrees ``{prefix}{i}`` (homogeneous
    across i, as ViTED's blocks are) into one tree of [depth, ...] leaves
    — the layout ``pipeline_apply`` shards over the stage axis."""
    layers = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, prefix: str) -> dict:
    """Inverse of :func:`stack_layer_params` (checkpoint interop)."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    return {f"{prefix}{i}": jax.tree.map(lambda x: x[i], stacked)
            for i in range(depth)}


def pp_param_specs(stacked: Any, axis: str = "stage") -> Any:
    """PartitionSpec pytree: the leading (layer) axis sharded over
    ``axis``, everything else replicated."""
    return jax.tree.map(lambda _: P(axis), stacked)


def shard_params_pp(stacked: Any, mesh: Mesh, axis: str = "stage") -> Any:
    """device_put the stacked layer params with stage sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked)


def pipeline_apply(layer_fn: Callable[[Any, Any], Any], stacked_params: Any,
                   stream: Any, mesh: Mesh, axis: str = "stage",
                   data_axis: str | None = None) -> Any:
    """Run ``stream``'s microbatches through the full layer stack with the
    layers stage-sharded over ``mesh``'s ``axis``.

    layer_fn(params_i, state) -> state applies ONE layer: ``params_i`` is
    one [ ... ] slice of ``stacked_params`` (no layer axis), ``state`` an
    arbitrary activation pytree. ``stream`` holds M microbatches as a
    pytree of [M, ...] leaves; returns the same structure, each microbatch
    transformed by all ``depth`` layers in order.

    ``data_axis`` composes the pipeline with data parallelism: every
    stream leaf's axis 1 (the within-microbatch batch dim) is sharded over
    that mesh axis, so each data shard runs its own GPipe ring over its
    slice while XLA all-reduces the resulting gradients over ``data_axis``
    as usual (the 2-D TPU.MESH_SHAPE [data, stage] product surface).

    Differentiable end to end; depth must divide evenly into the stage
    count (pad the stack with identity layers if it ever doesn't).
    """
    n_stage = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stage:
        raise ValueError(f"depth {depth} not divisible by {n_stage} stages")
    n_mb = jax.tree.leaves(stream)[0].shape[0]
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
    n_steps = n_mb + n_stage - 1

    def body(local_params, stream):
        stage = jax.lax.axis_index(axis)

        def apply_stage(state):
            def one(s, p):
                return layer_fn(p, s), None

            out, _ = jax.lax.scan(one, state, local_params)
            return out

        state = _vary(jax.tree.map(lambda s: jnp.zeros_like(s[0]), stream),
                      axis)
        outs = _vary(jax.tree.map(jnp.zeros_like, stream), axis)

        def step(carry, t):
            state, outs = carry
            # stage 0 picks up microbatch t (the clip keeps the gather
            # in-bounds during the drain steps; the where discards it)
            inject = _vary(
                jax.tree.map(
                    lambda s: jax.lax.dynamic_index_in_dim(
                        s, jnp.clip(t, 0, n_mb - 1), 0, keepdims=False),
                    stream), axis)
            take = jnp.logical_and(stage == 0, t < n_mb)
            state = jax.tree.map(lambda i, s: jnp.where(take, i, s),
                                 inject, state)
            state = apply_stage(state)
            # the last stage retires microbatch t - (S-1) into its buffer
            t_out = t - (n_stage - 1)
            done = jnp.logical_and(stage == n_stage - 1, t_out >= 0)
            idx = jnp.clip(t_out, 0, n_mb - 1)

            def retire(buf, s):
                cur = jax.lax.dynamic_index_in_dim(buf, idx, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(done, s, cur), idx, 0)

            outs = jax.tree.map(retire, outs, state)
            state = jax.tree.map(
                lambda s: jax.lax.ppermute(s, axis, perm), state)
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(step, (state, outs),
                                    jnp.arange(n_steps))
        # only the last stage's buffer is real; reduce it onto every device
        last = (stage == n_stage - 1)
        return jax.tree.map(
            lambda o: jax.lax.psum(jnp.where(last, o, jnp.zeros_like(o)),
                                   axis), outs)

    stream_spec = P(None, data_axis) if data_axis else P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pp_param_specs(stacked_params, axis),
                  jax.tree.map(lambda _: stream_spec, stream)),
        out_specs=jax.tree.map(lambda _: stream_spec, stream),
    )(stacked_params, stream)


# ---------------------------------------------------------------------------
# Product surface: TPU.PIPELINE_STAGES through the unmodified CLI
# ---------------------------------------------------------------------------

STACKED_ENC = "blocks_stacked"
STACKED_DEC = "cross_blocks_stacked"


def pp_transform_params(params: Any, depth: int, c_depth: int) -> Any:
    """Standard ViTED param tree -> PP layout: the per-layer ``blocks_i`` /
    ``cross_blocks_i`` subtrees stacked into ``blocks_stacked`` /
    ``cross_blocks_stacked`` ([depth, ...] leaves, the layout
    ``pipeline_apply`` stage-shards). Everything else passes through."""
    out = {k: v for k, v in params.items()
           if not (k.startswith("blocks_") or k.startswith("cross_blocks_"))}
    out[STACKED_ENC] = stack_layer_params(params, "blocks_", depth)
    out[STACKED_DEC] = stack_layer_params(params, "cross_blocks_", c_depth)
    return out


def pp_restore_params(pp_params: Any) -> Any:
    """Inverse of :func:`pp_transform_params` (eval / checkpoint interop)."""
    out = {k: v for k, v in pp_params.items()
           if k not in (STACKED_ENC, STACKED_DEC)}
    out.update(unstack_layer_params(pp_params[STACKED_ENC], "blocks_"))
    out.update(unstack_layer_params(pp_params[STACKED_DEC], "cross_blocks_"))
    return out


def pp_shard_transformed(pp_params: Any, mesh: Mesh,
                         axis: str = "stage") -> Any:
    """device_put a PP-layout tree: stacked subtrees stage-sharded over
    ``axis``, every other leaf replicated."""
    rep = NamedSharding(mesh, P())

    def put(path, x):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top in (STACKED_ENC, STACKED_DEC):
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(put, pp_params)


def pp_block_modules(model):
    """Standalone Block/CrossBlock modules matching ``model``'s blocks.

    The pipelined train step applies ONE homogeneous module with per-layer
    param slices, so per-layer module attributes must be uniform: the
    engine's config validation enforces DROP_PATH_RATE == 0 (stochastic
    depth rates are a per-layer linspace baked into module attributes, not
    params) and zero dropout, making attribute rate 0.0 exact."""
    from vit_ed_tpu.models.layers import Block, CrossBlock

    args = (model.embed_dim, model.num_heads, model.mlp_ratio,
            model.qkv_bias, model.qk_norm, 0.0, 0.0, model.init_values, 0.0,
            False, model.use_pallas, model.dtype, model.fast_gelu)
    return Block(*args), CrossBlock(*args)


def make_pp_loss_fn(model, mesh: Mesh, criterion, microbatches: int,
                    axis: str = "stage", data_axis: str = "data"):
    """The PP train-step loss: the full pjs pair forward with encoder AND
    decoder blocks GPipe-pipelined over ``axis``, composed with data
    parallelism over ``data_axis``.

    Matches ``make_train_step``'s custom loss_fn signature
    ``loss_fn(model, params, batch, rng) -> loss`` with ``params`` in the
    PP layout (:func:`pp_transform_params`). Embedding, final norm and the
    head are replicated (they are a rounding error of the FLOPs); the
    depth — where the weights live — is stage-sharded. Numerics equal the
    sequential stack's (tests/test_pp.py::test_pp_train_step_matches_dp)."""
    enc_blk, dec_blk = pp_block_modules(model)

    def enc_layer(p, t):
        return enc_blk.apply({"params": p}, t)

    def dec_layer(p, state):
        t, c = state
        return dec_blk.apply({"params": p}, t, c), c

    def loss_fn(_model, params, batch, rng):
        del _model, rng  # dropout-free by config validation
        samples, targets = batch["samples"], batch["targets"]
        other = {k: v for k, v in params.items()
                 if k not in (STACKED_ENC, STACKED_DEC)}
        b = samples.shape[0]
        if b % microbatches:
            raise ValueError(
                f"PP needs the global batch ({b}) divisible by "
                f"TPU.PP_MICROBATCHES ({microbatches})")
        mb = b // microbatches

        def stream_of(x):  # [B, ...] -> [M, mb, ...]
            return x.reshape((microbatches, mb) + x.shape[1:])

        t1 = model.apply({"params": other}, samples[:, 0],
                         method=model.embed_stream1)
        feats = pipeline_apply(enc_layer, params[STACKED_ENC],
                               stream_of(t1), mesh, axis, data_axis)
        t2 = model.apply({"params": other}, samples[:, 1],
                         method=model.prepare_x2)
        toks, _ = pipeline_apply(dec_layer, params[STACKED_DEC],
                                 (stream_of(t2), feats), mesh, axis,
                                 data_axis)
        logits = model.apply({"params": other},
                             toks.reshape((b,) + toks.shape[2:]),
                             method=model.head_from_tokens)
        return criterion(logits.astype(jnp.float32), targets)

    return loss_fn
