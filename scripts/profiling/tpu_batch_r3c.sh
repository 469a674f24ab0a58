#!/bin/bash
# Round-3 final TPU batch: full benchmark on the completed tree (torch
# max_eval budget + SegmentCarry threading + batch-2 train-step
# secondaries). One TPU process at a time: waits for the r3b marker.
#
# Usage:
#   nohup scripts/profiling/tpu_batch_r3c.sh & echo $! > /tmp/tpu_r3c.pid

set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/tpu_batch_r3c.log}"
exec >> "$LOG" 2>&1

echo "=== tpu_batch_r3c start $(date -u +%FT%TZ) (pid $$)"
while [ ! -f /tmp/tpu_batch_r3b.done ]; do
  echo "waiting for r3b $(date -u +%FT%TZ)"; sleep 120
done

echo "--- bench.py --full (final round-3 tree)"
timeout 7200 python bench.py --full \
  && cp output/bench_full.json "output/bench_full_$(date -u +%Y%m%dT%H%M).json"

echo "=== tpu_batch_r3c done $(date -u +%FT%TZ)"
touch /tmp/tpu_batch_r3c.done
