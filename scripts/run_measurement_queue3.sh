#!/usr/bin/env bash
# Stage-3 measurement queue: waits for stage 2, then measures the wide-N
# transposed-layout conv kernel (isolated + block-level). /tmp/mq3_*.
# Usage: nohup bash scripts/run_measurement_queue3.sh > /tmp/mq3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[mq3] waiting for stage-2 queue... $(date +%H:%M)"
until grep -q "^\[mq2\] done" /tmp/mq2.log 2>/dev/null; do sleep 60; done
echo "[mq3] stage 2 done $(date +%H:%M)"

echo "[mq3] 1/2 wide-conv isolated + block A/B"
timeout 5400 python scripts/bench_wide_conv.py --iters 20 --blocks --remat \
  > /tmp/mq3_wide.out 2> /tmp/mq3_wide.err
tail -20 /tmp/mq3_wide.out

echo "[mq3] 2/2 flagship step, wide_conv=on"
timeout 3600 python bench.py --quick --wide_conv=on \
  > /tmp/mq3_bench_wide.json 2> /tmp/mq3_bench_wide.err
echo "[mq3] wide_conv=on: $(cat /tmp/mq3_bench_wide.json)"
echo "[mq3] done $(date +%H:%M)"
