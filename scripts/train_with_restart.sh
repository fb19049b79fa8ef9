#!/bin/sh
# Crash-restart resilience wrapper (SURVEY §5.3: the reference's whole
# recovery story is relaunching; auto-resume picks up from the rolling
# checkpoint). Usage: scripts/train_with_restart.sh [train args...]
MAX_RETRIES=${MAX_RETRIES:-5}
n=0
while [ "$n" -le "$MAX_RETRIES" ]; do
    python -m gan3d_tpu.cli.train "$@" && exit 0
    n=$((n + 1))
    echo "train exited nonzero; restart $n/$MAX_RETRIES (resumes from checkpoint)" >&2
    sleep 5
done
echo "giving up after $MAX_RETRIES restarts" >&2
exit 1
