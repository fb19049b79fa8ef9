#!/usr/bin/env bash
# Stage-7 measurement queue (session 9):
#  (1) StyleGAN2 64^3 with fast_fir auto (now ON) — confirm the 147.0
#      vol/s A/B result reproduces through the default path
#  (2) StyleGAN2 128^3 batch 4 no-remat control (fast_fir off; known 10.6)
#  (3) StyleGAN2 128^3 batch 4 no-remat with fast_fir on
# Logs under /tmp/mq7_*.
# Usage: nohup bash scripts/run_measurement_queue7.sh > /tmp/mq7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq7] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq7] TPU up $(date +%H:%M)"

echo "[mq7] 1/3 sg2 64^3 default (fast_fir auto=on)"
timeout 3600 python bench.py --family stylegan2 \
  > /tmp/mq7_sg2_64.json 2> /tmp/mq7_sg2_64.err
echo "[mq7] sg2 64: $(cat /tmp/mq7_sg2_64.json)"

echo "[mq7] 2/3 sg2 128^3 control (fast_fir off)"
timeout 5400 python bench.py --family stylegan2 --resolution=128 \
  --filters 128 --batch 4 --remat=False --fast_fir=off \
  > /tmp/mq7_sg2_128_ctrl.json 2> /tmp/mq7_sg2_128_ctrl.err
echo "[mq7] sg2 128 ctrl: $(cat /tmp/mq7_sg2_128_ctrl.json)"

echo "[mq7] 3/3 sg2 128^3 fast_fir on"
timeout 5400 python bench.py --family stylegan2 --resolution=128 \
  --filters 128 --batch 4 --remat=False --fast_fir=on \
  > /tmp/mq7_sg2_128_fir.json 2> /tmp/mq7_sg2_128_fir.err
echo "[mq7] sg2 128 fir: $(cat /tmp/mq7_sg2_128_fir.json)"

echo "[mq7] 4/4 sg2 64^3 post-fast_fir profile trace"
timeout 3600 python scripts/profile_step.py --family stylegan2 \
  --out /tmp/mq7_sg2_trace > /tmp/mq7_sg2_prof.out 2>&1
timeout 600 python scripts/parse_trace.py /tmp/mq7_sg2_trace --top 25 \
  > /tmp/mq7_sg2_trace.txt 2>&1
tail -30 /tmp/mq7_sg2_trace.txt
echo "[mq7] done $(date +%H:%M)"
