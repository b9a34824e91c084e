#!/usr/bin/env bash
# TPU-pod launcher for HisFrag training — the TPU-native equivalent of the
# reference's SLURM script (/root/reference/hisfrag_slurm.sl): one process
# per host, env:// rendezvous consumed by vit_ed_tpu.parallel.mesh
# .maybe_init_distributed, data parallelism over all chips in the slice.
#
# Single-slice GCE TPU VM usage (run on every worker, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="bash hisfrag_tpu.sh"):
# JAX auto-discovers the slice topology, so no env vars are needed there.
# For manual/bring-your-own clusters, set the rendezvous explicitly:
#
#   WORLD_SIZE=<num hosts> RANK=<this host's index> \
#   MASTER_ADDR=<host0 address> MASTER_PORT=12355 bash hisfrag_tpu.sh
#
# SLURM: sbatch with one task per host — RANK/WORLD_SIZE fall back to
# SLURM_PROCID/SLURM_NTASKS automatically (mesh.py).

set -euo pipefail

DATA_PATH="${DATA_PATH:-/data/HisFrag20}"
OUTPUT="${OUTPUT:-output}"
CFG="${CFG:-configs/hisfrag/hisfrag20_patch16_512.yaml}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

python hisfrag.py \
  --cfg "$CFG" \
  --data-path "$DATA_PATH" \
  --output "$OUTPUT" \
  --batch-size "${BATCH_SIZE:-24}" \
  --mode "${MODE:-train}" \
  --opts TRAIN.EPOCHS "${EPOCHS:-300}" TRAIN.BASE_LR "${BASE_LR:-3e-4}" \
         TRAIN.WEIGHT_DECAY "${WEIGHT_DECAY:-0.01}"
