#!/bin/bash
# Probe the TPU tunnel; when it answers, launch the round-5 chip queue
# (hires host-vs-device A/B, then the bounded long-horizon run).
# $1 = queue deadline (epoch seconds) passed through to run_r5_queue.sh.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 28800 ))}
echo "watch start $(date +%T), queue deadline $(date -d @${DEADLINE} +%T)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "tunnel up $(date +%T); launching queue"
    bash scripts/run_r5_queue.sh "$DEADLINE"
    exit 0
  fi
  echo "tunnel down $(date +%T)"
  sleep 120
done
echo "deadline passed without tunnel"
exit 1
