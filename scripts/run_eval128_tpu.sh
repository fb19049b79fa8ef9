#!/bin/sh
# VERDICT r1 weak #5 / next-round #6: run the offline eval CLI and the
# tournament at REAL 128^3 scale on the TPU (the machinery was previously
# exercised only at 16^3 on the virtual CPU mesh). Wall-clock numbers land
# in docs/PERF.md.
#
# Usage: sh scripts/run_eval128_tpu.sh [workdir]
# Expects the single axon TPU to be free (one process per chip).
set -e
WORK=${1:-/tmp/eval128}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$WORK"
cd "$WORK"
export PYTHONPATH="$REPO:/root/.axon_site"

# 1. synthetic 128^3 test set (8 volumes) + train set (8 volumes)
python - <<'EOF'
import numpy as np
rng = np.random.default_rng(0)
for name in ("test128.npz", "train128.npz"):
    X = rng.normal(size=(8, 128, 128, 128)).astype(np.float32).clip(-1, 1)
    np.savez(name, X=X)
    print("wrote", name)
EOF

# 2. one short biggan training run at 128^3 (batch 2, remat, split-step —
#    the working 128^3 single-chip config, CLAUDE.md), then fan the
#    checkpoint out to the seed dirs eval/tournament expect (path+0/1/2).
if [ ! -d runA0 ]; then
  TT=$(date +%s)
  python -m gan3d_tpu.cli.train --data_path=train128.npz \
    --biggan=True --hinge=True --resolution=128 --niters=3 --batch_size=2 \
    --filterG=64 --filterD=64 --z_size=512 --remat=True --fused_step=False \
    --steps_per_log=1 --steps_per_img_log=1000 --fid_in_loop=False \
    --log_dir=runA0
  echo "train 3-iter wall-clock: $(( $(date +%s) - TT ))s"
  for d in runA1 runA2 runB0 runB1 runB2; do cp -r runA0 "$d"; done
fi

# 3. offline eval at 128^3 (both metric extractors fall back to documented
#    random-feature stand-ins when weight files are absent — the wall-clock
#    and memory behavior at scale is what this run measures).
echo "=== eval 128^3 ==="
T0=$(date +%s)
python -m gan3d_tpu.cli.eval -l runA --data_path=test128.npz \
  --batch_size=4 --n_seeds=3 --log_dir=eval_out --fid_checkpoint=

# 4. tournament at 128^3 between the two models.
echo "eval wall-clock: $(( $(date +%s) - T0 ))s"
echo "=== tournament 128^3 ==="
T1=$(date +%s)
python -m gan3d_tpu.cli.tournament -l runA -l runB \
  --data_path=test128.npz --batch_size=4 --n_seeds=3 --log_dir=tourn_out
echo "tournament wall-clock: $(( $(date +%s) - T1 ))s"
echo "ALL DONE"
