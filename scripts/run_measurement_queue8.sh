#!/usr/bin/env bash
# Round-5 measurement queue: the StyleGAN-1 closure chapter (VERDICT r4 #2)
# and the sg2 formatting-tail attempt (#4).
#  (1) sg1 64^3 control x2 (fresh numbers post dispatcher churn)
#  (2) sg1 --fast_adain=on x2        (one-pass-moments AdaIN)
#  (3) sg1 --c1_act=on x2            (squeezed-C=1 fromrgb activation)
#  (4) sg1 batch 32 (the missing batch-32 matrix cell; ladder tries
#      no-remat then remat)
#  (5) sg1 trace (profile_step + parse_trace) for the closure table
#  (6) sg2 batch-32 control, then --c1_wfirst=on, then --c1_act=on
#  (7) 256^3 single-chip infeasibility record (run_spatial_256 tpu mode)
# Logs under /tmp/mq8_*.
# Usage: nohup bash scripts/run_measurement_queue8.sh > /tmp/mq8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq8] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq8] TPU up $(date +%H:%M)"

run() {  # run NAME TIMEOUT ARGS...
  name=$1; t=$2; shift 2
  echo "[mq8] $name: bench.py $* ($(date +%H:%M))"
  timeout "$t" python bench.py "$@" \
    > "/tmp/mq8_$name.json" 2> "/tmp/mq8_$name.err"
  echo "[mq8] $name -> $(cat /tmp/mq8_$name.json 2>/dev/null)"
}

for i in a b; do
  run "sg1_ctrl_$i"   3600 --family stylegan
  run "sg1_adain_$i"  3600 --family stylegan --fast_adain=on
  run "sg1_c1act_$i"  3600 --family stylegan --c1_act=on
done
run "sg1_b32" 5400 --family stylegan --batch 32

echo "[mq8] sg1 trace"
timeout 3600 python scripts/profile_step.py --family stylegan \
  --out /tmp/mq8_sg1_trace > /tmp/mq8_sg1_prof.out 2>&1
python scripts/parse_trace.py /tmp/mq8_sg1_trace \
  > /tmp/mq8_sg1_trace.txt 2>&1 || true
tail -30 /tmp/mq8_sg1_trace.txt || true

for i in a b; do
  run "sg2_ctrl_$i"    3600 --family stylegan2 --batch 32 --remat=False
  run "sg2_wfirst_$i"  3600 --family stylegan2 --batch 32 --remat=False --c1_wfirst=on
  run "sg2_c1act_$i"   3600 --family stylegan2 --batch 32 --remat=False --c1_act=on
done

echo "[mq8] 256^3 infeasibility record"
timeout 7200 python scripts/run_spatial_256.py --mode=tpu_infeasible \
  > /tmp/mq8_sp256_tpu.log 2>&1
grep -E "INFEASIBLE|memory analysis|==" /tmp/mq8_sp256_tpu.log || true
echo "[mq8] DONE $(date +%H:%M)"
