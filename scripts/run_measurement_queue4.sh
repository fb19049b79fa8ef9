#!/usr/bin/env bash
# Stage-4 measurement queue: waits for stage 3, then
#  (a) A/Bs the fused-downconv backward form (custom VJP vs autodiff) at
#      step level — suspect for the 20.2 -> 19.2 headline drop, and
#  (b) reproduces the Mosaic dW-kernel compile failure with full stderr.
# Logs under /tmp/mq4_*.
# Usage: nohup bash scripts/run_measurement_queue4.sh > /tmp/mq4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[mq4] waiting for stage-3 queue... $(date +%H:%M)"
until grep -q "^\[mq3\] done" /tmp/mq3.log 2>/dev/null; do sleep 60; done
echo "[mq4] stage 3 done $(date +%H:%M)"

echo "[mq4] 1/3 flagship step, downconv_vjp=autodiff"
timeout 3600 python bench.py --quick --downconv_vjp=autodiff \
  > /tmp/mq4_nodvjp.json 2> /tmp/mq4_nodvjp.err
echo "[mq4] autodiff: $(cat /tmp/mq4_nodvjp.json)"

echo "[mq4] 2/3 flagship step, downconv_vjp=custom (same-session control)"
timeout 1800 python bench.py --quick --downconv_vjp=custom \
  > /tmp/mq4_dvjp.json 2> /tmp/mq4_dvjp.err
echo "[mq4] custom: $(cat /tmp/mq4_dvjp.json)"

echo "[mq4] 3/3 Mosaic dW compile failure repro (tiny shape, full stderr)"
timeout 900 python - > /tmp/mq4_mosaic.out 2>&1 <<'EOF'
import jax
import jax.numpy as jnp
import numpy as np
from gan3d_tpu.ops import dw_conv

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 32)).astype(np.float32),
                dtype=jnp.bfloat16)
g = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 32)).astype(np.float32),
                dtype=jnp.bfloat16)
try:
    out = jax.jit(dw_conv.conv3d_dw)(x, g)
    out.block_until_ready()
    print("tiny dW OK", out.shape, float(jnp.abs(out).mean()))
except Exception as e:  # noqa: BLE001 — we want the full error text
    print("tiny dW FAILED:")
    print(repr(e))
EOF
tail -5 /tmp/mq4_mosaic.out
echo "[mq4] done $(date +%H:%M)"
