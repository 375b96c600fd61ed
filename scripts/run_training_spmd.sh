#!/usr/bin/env bash
# Multi-chip data-parallel training — replaces the reference's
# torchrun DDP launcher (run_training_ddp.sh:23-31).  On a TPU pod
# slice, launch this same script on every host; JAX discovers the
# topology (jax.distributed.initialize via JAX_COORDINATOR_ADDRESS) and
# the mesh spans all chips.  --scale_factor mirrors the reference's
# linear batch/LR scaling (main.py:54-55).
set -euo pipefail

SAMPLER=${1:-imle}
K=${2:-2}
SCALE=${3:-4}          # reference: 4 GPUs -> scale_factor 4
DATA_DIR=${DATA_DIR:-./data}
OUT=${OUT:-./outputdir/mgat_spmd_${SAMPLER}_k${K}_x${SCALE}}

python main.py \
    --data_dir "${DATA_DIR}" \
    --sampler_type "${SAMPLER}" --sample_k "${K}" \
    --batch-size 256 --lr 5e-5 --scale_factor "${SCALE}" \
    --epochs 100 --mgat_masks 1.0 1.0 1.0 0.15 \
    --output_dir "${OUT}" "$@"
