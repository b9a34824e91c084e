"""Model factory keyed on MODEL.TYPE (reference models/build.py:15-95)."""

from __future__ import annotations

import jax.numpy as jnp

from .vit_ed import ViTED
from .vit import ViT


def compute_dtype(config):
    return jnp.bfloat16 if config.AMP_ENABLE else jnp.float32


def build_model(config, mesh=None):
    """Build the MODEL.TYPE model. ``mesh`` (the trainer's device mesh)
    activates the larger-variant parallelisms on pjs models:
    TPU.SEQ_PARALLEL token-shards the residual stream over the mesh's
    'model' axis and TPU.RING_ATTN runs attention itself sequence-parallel
    (docs/ARCHITECTURE.md)."""
    model_type = config.MODEL.TYPE
    dtype = compute_dtype(config)

    act_sharding = None
    if config.TPU.SEQ_PARALLEL:
        if mesh is None or "model" not in mesh.axis_names:
            raise ValueError("TPU.SEQ_PARALLEL needs a mesh with a 'model' "
                             "axis (TPU.MESH_SHAPE [data, model])")
        if model_type != "pjs":
            raise ValueError("TPU.SEQ_PARALLEL/RING_ATTN are pjs-only")
        from jax.sharding import NamedSharding, PartitionSpec

        act_sharding = NamedSharding(
            mesh, PartitionSpec("data", "model", None))
    elif ((config.TPU.FSDP or config.TPU.TENSOR_PARALLEL)
          and model_type == "pjs" and mesh is not None
          and "data" in mesh.axis_names):
        # ZeRO-3 / TP without sequence parallelism: activations stay
        # batch-sharded (only params are split); the explicit anchor keeps
        # the partitioner from involuntarily rematerializing the tiny
        # CLS-row attention intermediates (dryrun fail-on-warning check)
        from jax.sharding import NamedSharding, PartitionSpec

        act_sharding = NamedSharding(mesh, PartitionSpec("data", None, None))

    if model_type == "pjs":
        return ViTED(
            img_size=config.DATA.IMG_SIZE,
            patch_size=config.MODEL.PJS.PATCH_SIZE,
            in_chans=config.MODEL.PJS.IN_CHANS,
            num_classes=config.MODEL.NUM_CLASSES,
            embed_dim=config.MODEL.PJS.EMBED_DIM,
            depth=config.MODEL.PJS.DEPTH,
            c_depth=config.MODEL.PJS.C_DEPTH,
            num_heads=config.MODEL.PJS.NUM_HEADS,
            mlp_ratio=config.MODEL.PJS.MLP_RATIO,
            qkv_bias=config.MODEL.PJS.QKV_BIAS,
            drop_rate=config.MODEL.DROP_RATE,
            drop_path_rate=config.MODEL.DROP_PATH_RATE,
            keep_attn=config.MODEL.PJS.KEEP_ATTN,
            cls_shortcut=config.TPU.CLS_SHORTCUT,
            use_pallas=None if config.TPU.USE_PALLAS_ATTENTION else False,
            remat=config.TRAIN.USE_CHECKPOINT,
            fast_gelu=config.TPU.FAST_GELU,
            act_sharding=act_sharding,
            ring_attn=config.TPU.RING_ATTN,
            moe_experts=config.MODEL.PJS.MOE.EXPERTS,
            moe_interval=config.MODEL.PJS.MOE.INTERVAL,
            moe_capacity=config.MODEL.PJS.MOE.CAPACITY,
            moe_route_k=config.MODEL.PJS.MOE.ROUTE_K,
            moe_jitter=config.MODEL.PJS.MOE.JITTER,
            dtype=dtype,
        )
    if model_type == "vit":
        return ViT(
            img_size=config.DATA.IMG_SIZE,
            patch_size=config.MODEL.VIT.PATCH_SIZE,
            in_chans=config.MODEL.VIT.IN_CHANS,
            num_classes=config.MODEL.NUM_CLASSES,
            embed_dim=config.MODEL.VIT.EMBED_DIM,
            depth=config.MODEL.VIT.DEPTH,
            num_heads=config.MODEL.VIT.NUM_HEADS,
            mlp_ratio=config.MODEL.VIT.MLP_RATIO,
            qkv_bias=config.MODEL.VIT.QKV_BIAS,
            drop_rate=config.MODEL.DROP_RATE,
            drop_path_rate=config.MODEL.DROP_PATH_RATE,
            use_pallas=None if config.TPU.USE_PALLAS_ATTENTION else False,
            remat=config.TRAIN.USE_CHECKPOINT,
            fast_gelu=config.TPU.FAST_GELU,
            dtype=dtype,
        )
    if model_type in ("ss", "ss2", "ss2ce"):
        from .simsiam import build_simsiam

        return build_simsiam(config, model_type, dtype)
    if model_type in ("resnet", "mixconv"):
        from .resnet import build_resnet_model

        return build_resnet_model(config, model_type, dtype)
    raise NotImplementedError(f"Unknown model: {model_type}")
