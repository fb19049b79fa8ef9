#!/usr/bin/env bash
# Round-5 queue 2: conv_dx A/B, sg2 composition, and the record runs.
#  (1) sg1 control x2 (fast_adain now auto-ON — the new default path)
#  (2) sg1 --conv_dx=on x2 (explicit-conv G backward)
#  (3) sg2 default x1 (c1_wfirst now auto-ON — confirm through defaults)
#  (4) sg2 --c1_act=on x2 (composition with wfirst)
#  (5) --record runs for the improved families (sg2; sg1 if conv_dx GO
#      is applied manually after)
# Logs under /tmp/mq9_*.
# Usage: nohup bash scripts/run_measurement_queue9.sh > /tmp/mq9.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "[mq9] waiting for TPU... $(date +%H:%M)"
until probe; do sleep 60; done
echo "[mq9] TPU up $(date +%H:%M)"

run() {  # run NAME TIMEOUT ARGS...
  name=$1; t=$2; shift 2
  echo "[mq9] $name: bench.py $* ($(date +%H:%M))"
  timeout "$t" python bench.py "$@" \
    > "/tmp/mq9_$name.json" 2> "/tmp/mq9_$name.err"
  echo "[mq9] $name -> $(cat /tmp/mq9_$name.json 2>/dev/null)"
}

for i in a b; do
  run "sg1_ctrl_$i"  3600 --family stylegan
  run "sg1_dx_$i"    3600 --family stylegan --conv_dx=on
done
run "sg2_default" 3600 --family stylegan2
for i in a b; do
  run "sg2_act_$i" 3600 --family stylegan2 --c1_act=on
done
run "sg2_record" 3600 --family stylegan2 --record
echo "[mq9] DONE $(date +%H:%M)"
