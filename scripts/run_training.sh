#!/usr/bin/env bash
# Single-chip training runs — the reference's run_training.sh configs
# of record (bs in {128,256,512}, k in {2..5}, samplers
# imle/aimle/simple/gumbel; run_training.sh:5-13).
set -euo pipefail

SAMPLER=${1:-imle}
K=${2:-2}
BS=${3:-256}
DATA_DIR=${DATA_DIR:-./data}
OUT=${OUT:-./outputdir/mgat_bs_${BS}_${SAMPLER}_k${K}_v1}

python main.py \
    --data_dir "${DATA_DIR}" \
    --sampler_type "${SAMPLER}" --sample_k "${K}" \
    --nb_samples 1 --alpha 1.0 --beta 10.0 --tau 1.0 \
    --batch-size "${BS}" --lr 5e-5 --epochs 100 \
    --mgat_masks 1.0 1.0 1.0 0.15 \
    --output_dir "${OUT}" "$@"
