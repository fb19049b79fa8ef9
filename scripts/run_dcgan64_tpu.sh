#!/bin/sh
# VERDICT r2 next #2 / BASELINE config 2: one recorded train -> full-eval
# unit for the DCGAN family at 64^3 on the TPU (reference dcgan.py:8-195
# trained by trainer.py's WGAN branch, evaluated by eval.py:31-92).
# Wall-clock numbers land in docs/PERF.md.
#
# Usage: sh scripts/run_dcgan64_tpu.sh [workdir]
# Expects the single axon TPU to be free (one process per chip).
set -e
WORK=${1:-/tmp/dcgan64}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$WORK"
cd "$WORK"
export PYTHONPATH="$REPO:/root/.axon_site"

# 1. synthetic 64^3 train + test sets (32 volumes each).
python - <<'EOF'
import numpy as np
rng = np.random.default_rng(0)
for name in ("train64.npz", "test64.npz"):
    X = rng.normal(size=(32, 64, 64, 64)).astype(np.float32).clip(-1, 1)
    np.savez(name, X=X)
    print("wrote", name)
EOF

# 2. DCGAN 64^3 training (config 1's model at config 2's resolution:
#    WGAN loss, LayerNorm D — the reference's default variant), long
#    enough past compile for a steady-state steps/s line.
if [ ! -d runA0 ]; then
  TT=$(date +%s)
  python -m gan3d_tpu.cli.train --data_path=train64.npz \
    --dcgan=True --resolution=64 --niters=30 --batch_size=16 \
    --filterG=64 --filterD=64 --z_size=512 \
    --steps_per_log=10 --steps_per_img_log=1000 --fid_in_loop=False \
    --log_dir=runA0
  echo "train 30-iter wall-clock: $(( $(date +%s) - TT ))s"
  for d in runA1 runA2; do cp -r runA0 "$d"; done
fi

# 3. the FULL offline eval loop on the checkpoint (MS-SSIM-3D, MMD, PSNR,
#    slice-FID ax/cor/sag, 3D-FID — extractors fall back to documented
#    random-feature stand-ins where weight files are absent, same as the
#    reference would crash without its .pth files).
echo "=== eval 64^3 (config 2 full loop) ==="
T0=$(date +%s)
python -m gan3d_tpu.cli.eval -l runA --data_path=test64.npz \
  --batch_size=16 --n_seeds=3 --log_dir=eval_out --fid_checkpoint=
echo "eval wall-clock: $(( $(date +%s) - T0 ))s"
echo "ALL DONE"
