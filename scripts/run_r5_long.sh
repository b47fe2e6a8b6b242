#!/bin/bash
# Round-5 bounded long-horizon stability run (VERDICT r4 item 5).
# 20k steps @64px shapes_hard on the production path, schedules compressed
# to the run length (teacher-temp warmup completes at 5k, wd ramp and
# momentum->1 span the full 20k), k-NN telemetry every 5k steps.
# $1 = wall-clock budget in seconds (default 3300).
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-3300}
timeout $(( BUDGET + 600 )) python scripts/validate_learning.py \
    --task shapes_hard --steps 20000 --eval_every 5000 \
    --max_seconds "$BUDGET" > /tmp/r5_long.log 2>&1
echo "LONG_DONE_$?" >> /tmp/r5_status
