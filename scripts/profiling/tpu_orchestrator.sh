#!/bin/bash
# Unattended TPU batch runner for tunnel outages.
#
# The axon TPU tunnel can die for hours after a worker OOM (CLAUDE.md).
# A short uptime window is too valuable to need a human in the loop, so
# this script polls `jax.devices()` under timeout and, on the FIRST
# successful probe, runs the queued TPU batch — benchmark first (the
# known-good path and the artifact of record), then profiling probes
# safest-to-riskiest, each in its own bounded process so one worker
# crash cannot take down the rest of the batch.
#
# Usage:
#   nohup scripts/profiling/tpu_orchestrator.sh [logfile] & echo $! > /tmp/tpu_orch.pid
#   tail -f /tmp/tpu_orchestrator.log
#   kill $(cat /tmp/tpu_orch.pid)          # never pkill by pattern
#
# Edit the BATCH section below per session; keep every entry under
# `timeout` and one-TPU-process-at-a-time (the rules of the house).

set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/tpu_orchestrator.log}"
exec >> "$LOG" 2>&1

echo "=== tpu_orchestrator start $(date -u +%FT%TZ) (pid $$)"

# ---- poll until the tunnel answers -------------------------------------
while true; do
  if timeout 120 python -c \
      "import jax; d=jax.devices(); assert d[0].platform != 'cpu'; print(d)"
  then
    echo "=== tunnel up $(date -u +%FT%TZ)"
    break
  fi
  echo "down $(date -u +%FT%TZ)"
  sleep 300
done

# ---- BATCH (bench first, then probes safest-to-riskiest) ---------------
echo "--- bench.py --full"
timeout 5400 python bench.py --full \
  && cp output/bench_full.json "output/bench_full_$(date -u +%Y%m%dT%H%M).json"

echo "--- prof_primary_fuse"
timeout 1800 python scripts/profiling/prof_primary_fuse.py

for v in base nostep noblock none; do
  echo "--- prof_win6_variants $v"
  timeout 2400 python scripts/profiling/prof_win6_variants.py "$v"
done

echo "=== tpu_orchestrator done $(date -u +%FT%TZ)"
touch /tmp/tpu_orchestrator.done
