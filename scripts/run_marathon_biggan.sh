#!/bin/sh
# Round-5 flagship training marathon (VERDICT r4 #1): a 2,000-step
# BigGAN-Deep 64^3 hinge run through the PRODUCTION CLI on the real chip,
# with a mid-run kill + auto-resume (proving Orbax exact continuation at
# step >500 on-chip), in-loop FID every steps_per_log, PNG sample grids,
# then the full downstream cycle on the resulting run dir: cli.eval,
# cli.export_torch, and a cli.tournament match against a second
# (shorter-trained) seed.  Reference anchors: trainer.py:285-313 (loop),
# main.py:8 (niters default 5000), run.sh (multi-seed convention).
#
# Usage: sh scripts/run_marathon_biggan.sh [workdir]
# Expects the single axon TPU to be free (one process per chip).
set -e
WORK=${1:-/tmp/marathon}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$WORK"
cd "$WORK"
export PYTHONPATH="$REPO:/root/.axon_site"

# 1. structured synthetic datasets (soft-ellipsoid phantoms — learnable
#    structure, so losses/FID/samples are meaningful; see the generator).
[ -f train64.npz ] || python "$REPO/scripts/make_synth_dataset.py" \
    --out train64.npz --n 256 --res 64 --seed 0
[ -f test64.npz ] || python "$REPO/scripts/make_synth_dataset.py" \
    --out test64.npz --n 64 --res 64 --seed 1

TRAIN="python -m gan3d_tpu.cli.train --data_path=train64.npz \
  --biggan=True --hinge=True --resolution=64 --batch_size=16 \
  --filterG=64 --filterD=64 --z_size=512 --fid_in_loop=True \
  --niters=2000 --seed=0 --log_dir=marathon0"

# 2. phase A: launch; kill hard once training passes step 740 (the rolling
#    checkpoint then holds step 700 — reference cadence, trainer.py:307-310).
if [ ! -f train_b.log ]; then
  sh -c "exec $TRAIN" > train_a.log 2>&1 &
  PID=$!
  echo "phase A pid $PID; waiting for step 740..."
  while ! grep -q "^\[74[0-9]|" train_a.log; do
    kill -0 "$PID" 2>/dev/null || { echo "train died early:"; tail -5 train_a.log; exit 1; }
    sleep 10
  done
  kill -9 "$PID" 2>/dev/null || true
  wait "$PID" 2>/dev/null || true
  echo "=== killed mid-run; last lines: ==="
  tail -3 train_a.log

  # 3. phase B: relaunch the identical command; auto-resume must pick up
  #    from the rolling checkpoint and run to completion.
  sh -c "exec $TRAIN" > train_b.log 2>&1
  grep "starting from step" train_b.log
  tail -2 train_b.log
fi

# 4. rival seed: a second, much shorter run for the tournament match.
if [ ! -d rival0/models ]; then
  python -m gan3d_tpu.cli.train --data_path=train64.npz \
    --biggan=True --hinge=True --resolution=64 --batch_size=16 \
    --filterG=64 --filterD=64 --z_size=512 --fid_in_loop=True \
    --niters=300 --seed=1 --log_dir=rival0 > train_rival.log 2>&1
  tail -2 train_rival.log
fi

# 5. offline eval on the marathon run dir (extractors fall back to the
#    documented random-feature stand-ins; the pipeline is the point).
echo "=== eval ==="
python -m gan3d_tpu.cli.eval -l marathon --n_seeds=1 --data_path=test64.npz \
  --batch_size=16 --log_dir=eval_out --fid_checkpoint= 2>&1 | tee eval.log

# 6. export the trained checkpoint to a reference-layout torch .pt.
echo "=== export_torch ==="
python -m gan3d_tpu.cli.export_torch --log_dir=marathon0 \
  --out marathon0_torch.pt
ls -la marathon0_torch.pt

# 7. tournament: marathon G vs rival G, judged by both Ds.
echo "=== tournament ==="
python -m gan3d_tpu.cli.tournament -l marathon -l rival --n_seeds=1 \
  --data_path=test64.npz --batch_size=16 2>&1 | tee tournament.log
echo "MARATHON DONE"
