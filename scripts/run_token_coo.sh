#!/usr/bin/env bash
# Explanation-extraction launcher — equivalent of the reference's
# run_tok_coo.sh (background nohup run of run_token_coo.py over a
# trained checkpoint; reference hard-codes the experiment name, here
# it is the first argument).
set -euo pipefail

CKPT=${1:?usage: run_token_coo.sh <checkpoint dir> [extra flags...]}
shift || true
NAME=$(basename "$(dirname "${CKPT}")")_token_coo

export TOKENIZERS_PARALLELISM=true
nohup python -u run_token_coo.py --ckpt "${CKPT}" "$@" \
    > "${NAME}.out" 2>&1 &
echo "started: ${NAME}.out (pid $!)"
