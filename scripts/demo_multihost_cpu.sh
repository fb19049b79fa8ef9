#!/usr/bin/env bash
# Multi-host (multi-process) training demo on CPU: 2 processes x 4 virtual
# devices, gloo collectives, one global 8-device data-parallel mesh.
# Validates jax.distributed.initialize + put_global_batch + distributed
# checkpointing without a TPU pod. Prints MULTIHOST_OK on success.
set -euo pipefail
cd "$(dirname "$0")/.."

TMP=$(mktemp -d)
python - <<EOF
import numpy as np
np.savez("$TMP/train.npz", X=np.clip(np.random.default_rng(0).normal(
    size=(16, 16, 16, 16)).astype(np.float32), -1, 1))
EOF

PORT=${PORT:-12355}
for i in 0 1; do
  python scripts/multihost_worker.py --process_id=$i --num_processes=2 \
    --coordinator=127.0.0.1:$PORT --data="$TMP/train.npz" \
    --log_dir="$TMP/run" > "$TMP/proc$i.log" 2>&1 &
  PIDS[$i]=$!
done
rc=0
for i in 0 1; do
  wait ${PIDS[$i]} || rc=$?
done
cat "$TMP/proc0.log" | tail -6
grep -q MULTIHOST_OK "$TMP/proc0.log" || { echo "FAILED (proc1 tail):";
  tail -20 "$TMP/proc1.log"; exit 1; }
exit $rc
