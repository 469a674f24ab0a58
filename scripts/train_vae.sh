#!/usr/bin/env bash
# NMC VAE training (reference train_vae_script.sh:20-30 equivalent).
# Data-parallel over all local devices; pass --mesh-style options via "$@".
set -euo pipefail
cd "$(dirname "$0")/.."

python run_train_vae.py \
  --sigma 2.0 \
  --lr 1e-4 \
  --epochs 5 \
  "$@"
