#!/usr/bin/env bash
# Cycled DA run, configuration of record (reference da_4dvar_script.sh:14).
# On a TPU VM: just run; on multi-host slices, launch on every worker
# (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
#
# The run loops on failure and RESUMES from the cycler's on-disk cursor
# (xb.npy + current_time.txt) — the reference's preemptible-SLURM
# workflow (da_4dvar_script.sh `--quotatype=auto`): TPU worker restarts
# and preemptions cost at most one cycle, and the persistent XLA compile
# cache makes the restart cheap.
set -uo pipefail
cd "$(dirname "$0")/.."

MAX_RETRIES="${MAX_RETRIES:-20}"
attempt=0
while :; do
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
    "$@" && break
  attempt=$((attempt + 1))
  if [ "$attempt" -ge "$MAX_RETRIES" ]; then
    echo "run_da failed ${MAX_RETRIES} times; giving up" >&2
    exit 1
  fi
  echo "run_da exited nonzero; resuming from checkpoint (attempt ${attempt})" >&2
  sleep 30
done
