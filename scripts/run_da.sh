#!/usr/bin/env bash
# Cycled DA run, configuration of record (reference da_4dvar_script.sh:14).
# On a TPU VM: just run; on multi-host slices, launch on every worker
# (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
set -euo pipefail
cd "$(dirname "$0")/.."

python run_da.py \
  --da_mode vae4dvar \
  --da_win 1 \
  --Nit 4 \
  --obs_std 0.005 \
  --obs_type column_random_0001 \
  --modify_tp 2 \
  --scale_factor 2.0 \
  --q_type 1 \
  --obs_coeff 1.0 \
  --filter_coeff 0.1 \
  --start_time "2022-01-01 00:00:00" \
  --end_time   "2023-01-01 12:00:00" \
  --vae_ckpt   "${VAE_CKPT:-}" \
  --flow_ckpt  "${FLOW_CKPT:-}" \
  --forecast_ckpt "${FORECAST_CKPT:-}" \
  "$@"
