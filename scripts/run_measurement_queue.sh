#!/usr/bin/env bash
# Wait for the axon TPU to come back, then run the queued measurements
# serially (one process may hold the chip at a time). Logs under /tmp/mq_*.
# Usage: nohup bash scripts/run_measurement_queue.sh &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq] TPU up $(date +%H:%M)"

echo "[mq] 1/6 headline bench (warms .jax_cache for the driver)"
timeout 3600 python bench.py > /tmp/mq_bench.json 2> /tmp/mq_bench.err
echo "[mq] headline: $(cat /tmp/mq_bench.json)"

echo "[mq] 2/6 backward-conv microbench"
timeout 3600 python scripts/bench_bwd_convs.py --iters 20 \
  > /tmp/mq_bwd.out 2> /tmp/mq_bwd.err

echo "[mq] 3/6 step decomposition"
if [ -f scripts/bench_step_decomp.py ]; then
  timeout 3600 python scripts/bench_step_decomp.py \
    > /tmp/mq_decomp.out 2> /tmp/mq_decomp.err
fi

echo "[mq] 4/6 128^3 split-mode bench (custom VJP at scale)"
timeout 5400 python bench.py --resolution=128 --batch=2 --remat=True \
  --fused_step=False > /tmp/mq_bench128.json 2> /tmp/mq_bench128.err
echo "[mq] 128^3: $(cat /tmp/mq_bench128.json)"

echo "[mq] 5/6 stylegan2 64^3 bench"
timeout 3600 python bench.py --family=stylegan2 --quick \
  > /tmp/mq_bench_sg2.json 2> /tmp/mq_bench_sg2.err
echo "[mq] sg2: $(cat /tmp/mq_bench_sg2.json)"

echo "[mq] 6/6 quick re-check (cache-warm second run)"
timeout 1800 python bench.py --quick > /tmp/mq_bench_quick.json 2>> /tmp/mq_bench.err
echo "[mq] quick: $(cat /tmp/mq_bench_quick.json)"
echo "[mq] done $(date +%H:%M)"
