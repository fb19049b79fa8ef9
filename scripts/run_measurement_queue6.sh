#!/usr/bin/env bash
# Stage-6 measurement queue (session 7):
#  (1) attention microbench — the rewritten Pallas backward (bf16 MXU
#      inputs + 1/denom folded out of the [BQ,M] tiles)
#  (2) headline bench control (includes the new attention backward)
#  (3) headline with --fast_stem=on (step-level A/B for ops/s2d_conv.py)
#  (4) 128^3 split-mode retry (flaked on the remote compile helper in mq5)
# Logs under /tmp/mq6_*.
# Usage: nohup bash scripts/run_measurement_queue6.sh > /tmp/mq6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq6] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq6] TPU up $(date +%H:%M)"

echo "[mq6] 1/4 attention microbench (rewritten backward)"
timeout 3600 python scripts/bench_attention.py --iters 10 \
  > /tmp/mq6_attn.out 2> /tmp/mq6_attn.err
tail -10 /tmp/mq6_attn.out

echo "[mq6] 2/4 headline control (new attention bwd)"
timeout 3600 python bench.py > /tmp/mq6_bench.json 2> /tmp/mq6_bench.err
echo "[mq6] headline: $(cat /tmp/mq6_bench.json)"

echo "[mq6] 3/4 headline with fast_stem=on"
timeout 3600 python bench.py --fast_stem=on \
  > /tmp/mq6_bench_stem.json 2> /tmp/mq6_bench_stem.err
echo "[mq6] fast_stem: $(cat /tmp/mq6_bench_stem.json)"

echo "[mq6] 4/4 128^3 split-mode retry"
timeout 5400 python bench.py --resolution=128 --batch 2 --remat=True \
  --fused_step=False \
  > /tmp/mq6_bench128.json 2> /tmp/mq6_bench128.err
echo "[mq6] 128^3: $(cat /tmp/mq6_bench128.json)"
echo "[mq6] done $(date +%H:%M)"
