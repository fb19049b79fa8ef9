#!/usr/bin/env bash
# Stage-5 measurement queue: waits for the axon TPU to come back, then
#  (1) headline bench (control for the b1=0 optimizer + warms .jax_cache)
#  (2) glue-attribution ladder (scripts/bench_glue.py) — where do the
#      unattributed ~15-20% of the fused step go?
#  (3) profiler trace of the fused step (scripts/profile_step.py) for
#      offline op-level ranking (scripts/parse_trace.py)
#  (4) 128^3 split-mode bench (custom VJP + new optimizer at scale)
# Logs under /tmp/mq5_*.
# Usage: nohup bash scripts/run_measurement_queue5.sh > /tmp/mq5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq5] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq5] TPU up $(date +%H:%M)"

echo "[mq5] 1/4 headline bench (b1=0 optimizer control)"
timeout 3600 python bench.py > /tmp/mq5_bench.json 2> /tmp/mq5_bench.err
echo "[mq5] headline: $(cat /tmp/mq5_bench.json)"

echo "[mq5] 2/4 glue-attribution ladder"
timeout 5400 python scripts/bench_glue.py --iters 10 \
  > /tmp/mq5_glue.out 2> /tmp/mq5_glue.err
tail -20 /tmp/mq5_glue.out

echo "[mq5] 3/4 profiler trace"
rm -rf /tmp/step_trace
timeout 3600 python scripts/profile_step.py --out /tmp/step_trace \
  > /tmp/mq5_prof.out 2> /tmp/mq5_prof.err
timeout 600 python scripts/parse_trace.py /tmp/step_trace \
  > /tmp/mq5_trace_rank.out 2>&1 || true
tail -30 /tmp/mq5_trace_rank.out

echo "[mq5] 4/4 128^3 split-mode bench"
timeout 5400 python bench.py --resolution=128 --batch=2 --remat=True \
  --fused_step=False > /tmp/mq5_bench128.json 2> /tmp/mq5_bench128.err
echo "[mq5] 128^3: $(cat /tmp/mq5_bench128.json)"
echo "[mq5] done $(date +%H:%M)"
