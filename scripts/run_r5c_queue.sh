#!/bin/bash
# Round-5 chip queue, phase C (post-outage): probe the tunnel; when it
# answers, run (1) the bounded long-horizon stability run (VERDICT r4
# item 5) sized to the remaining session window, then (2) the CvT retune
# at the reference's Swin:CvT LR ratio (lr 2e-3 = half the Swin-tuned
# 4e-3; ref cvt_v4/s1.yaml runs CvT at half the DINO base LR).
# $1 = hard deadline (epoch seconds): no new chip work after this.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 6000 ))}
echo "queue C start $(date +%T), deadline $(date -d @${DEADLINE} +%T)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 150 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "tunnel up $(date +%T)"
    break
  fi
  echo "tunnel down $(date +%T)"
  sleep 60
done
NOW=$(date +%s)
LEFT=$(( DEADLINE - NOW ))
if [ "$LEFT" -lt 600 ]; then
  echo "NO_TIME_LEFT" >> /tmp/r5_status
  exit 1
fi

# Long run: reserve ~1700s for the CvT retune + final checks when there
# is room; otherwise take what's there. Budget excludes ~300s of
# compile/eval overhead inside the script.
CVT_RESERVE=1700
LONG_BUDGET=$(( LEFT - CVT_RESERVE - 420 ))
if [ "$LONG_BUDGET" -gt 3300 ]; then LONG_BUDGET=3300; fi
if [ "$LONG_BUDGET" -ge 900 ]; then
  echo "long run budget ${LONG_BUDGET}s"
  bash scripts/run_r5_long.sh "$LONG_BUDGET"
fi

NOW=$(date +%s)
LEFT=$(( DEADLINE - NOW ))
if [ "$LEFT" -ge 1500 ]; then
  timeout $(( LEFT - 60 )) python scripts/validate_learning.py \
      --backbone cvt --task shapes_hard --steps 6000 --lr 2e-3 \
      --max_seconds $(( LEFT - 360 )) > /tmp/r5_cvt_lr2e3.log 2>&1
  echo "CVT_RETUNE_DONE_$?" >> /tmp/r5_status
fi
echo "QUEUE_C_DONE" >> /tmp/r5_status
