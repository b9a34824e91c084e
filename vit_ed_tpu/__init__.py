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
