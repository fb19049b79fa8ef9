#!/usr/bin/env bash
# Stage-2 measurement queue: waits for run_measurement_queue.sh to finish
# (only one process may hold the axon TPU), then measures the Pallas dW
# kernel at step level. Logs under /tmp/mq2_*.
# Usage: nohup bash scripts/run_measurement_queue2.sh > /tmp/mq2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[mq2] waiting for stage-1 queue... $(date +%H:%M)"
until grep -q "^\[mq\] done" /tmp/mq.log 2>/dev/null; do sleep 60; done
echo "[mq2] stage 1 done $(date +%H:%M)"

echo "[mq2] 1/2 flagship step, fast_dw=on"
timeout 3600 python bench.py --fast_dw=on \
  > /tmp/mq2_bench_dw.json 2> /tmp/mq2_bench_dw.err
echo "[mq2] fast_dw=on: $(cat /tmp/mq2_bench_dw.json)"

echo "[mq2] 2/2 flagship step, fast_dw=off (same-session control)"
timeout 1800 python bench.py --quick --fast_dw=off \
  > /tmp/mq2_bench_nodw.json 2> /tmp/mq2_bench_nodw.err
echo "[mq2] fast_dw=off: $(cat /tmp/mq2_bench_nodw.json)"
echo "[mq2] done $(date +%H:%M)"
