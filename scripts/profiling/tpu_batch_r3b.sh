#!/bin/bash
# Round-3 follow-up TPU batch: win6 dispatch-granularity probe (+1.4deg
# anomaly phase timing), then the full benchmark re-run with the fixed
# bench.py (resilient secondaries, remat'd train steps) and probe-decided
# defaults. Waits for the primary orchestrator's .done marker so only one
# TPU process ever runs (rules of the house).
#
# Usage:
#   nohup scripts/profiling/tpu_batch_r3b.sh & echo $! > /tmp/tpu_r3b.pid
#   tail -f /tmp/tpu_batch_r3b.log

set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/tpu_batch_r3b.log}"
exec >> "$LOG" 2>&1

echo "=== tpu_batch_r3b start $(date -u +%FT%TZ) (pid $$)"

while [ ! -f /tmp/tpu_orchestrator.done ]; do
  echo "waiting for primary orchestrator $(date -u +%FT%TZ)"
  sleep 120
done
echo "=== primary orchestrator done; starting $(date -u +%FT%TZ)"

for v in seg1 seg10 fused anomaly; do
  echo "--- prof_win6_dispatch $v"
  timeout 2400 python scripts/profiling/prof_win6_dispatch.py "$v"
done

echo "--- bench.py --full (fixed)"
timeout 7200 python bench.py --full \
  && cp output/bench_full.json "output/bench_full_$(date -u +%Y%m%dT%H%M).json"

echo "=== tpu_batch_r3b done $(date -u +%FT%TZ)"
touch /tmp/tpu_batch_r3b.done
