"""vit_ed_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for pairwise
visual-fragment relationship learning.

Re-designed from scratch with the capabilities of the reference PyTorch
framework glmanhtu/vit-ed ("Pajigsaw" / ViT-ED): a two-stream ViT
encoder-decoder scoring image pairs for jigsaw-puzzle assembly and
historical-fragment writer retrieval, plus the classical Paikin-Tal greedy
solver, retrieval metrics, and the training/eval infrastructure around them.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

  config     -- YAML config tree with BASE inheritance + dotted overrides
  models     -- Flax ViT-ED (encoder/decoder split as pure functions), ViT,
                SimSiam, ResNet/MixConv baselines
  ops        -- Pallas TPU kernels (fused flash attention self+cross) with
                XLA fallbacks
  parallel   -- jax.sharding Mesh helpers; sharded O(N^2) pairwise scoring
  train      -- Trainer engine, optax optimizers/schedules, orbax checkpoints
  data       -- datasets (DIV2K pairs, HisFrag20, Michigan, Geshaem,
                Pajigsaw, solver pieces), native transforms, samplers, loader
  solver     -- torch-free Paikin-Tal solver with vectorized compatibility
  metrics    -- wi19 retrieval metrics, mAP/Pr@k, meters
"""

__version__ = "0.1.0"


def _apply_platform_override():
    """Honor VIT_ED_PLATFORM (e.g. ``cpu``) and VIT_ED_CPU_DEVICES (virtual
    CPU device count) for every entry point.

    ``JAX_PLATFORMS`` alone is not enough in environments whose
    sitecustomize imports jax before user env vars are consulted; backends
    are initialised lazily, so updating the config here (the package is
    imported before any backend use) still takes effect. Lets the CLI run
    on CPU hosts — e.g. smoke-testing without a TPU attached, or a
    dev-box dry run on a virtual multi-device mesh:

        VIT_ED_PLATFORM=cpu VIT_ED_CPU_DEVICES=8 python main.py ...
    """
    import os

    platform = os.environ.get("VIT_ED_PLATFORM")
    ndev = os.environ.get("VIT_ED_CPU_DEVICES")
    if not platform and not ndev:
        return
    import jax

    try:
        if ndev:
            platform = platform or "cpu"
            jax.config.update("jax_num_cpu_devices", int(ndev))
        jax.config.update("jax_platforms", platform)
    except Exception as e:  # backends already live: misconfigured caller
        raise RuntimeError(
            f"VIT_ED_PLATFORM={platform!r} could not be applied — a jax "
            "backend was initialised before vit_ed_tpu was imported"
        ) from e


_apply_platform_override()
