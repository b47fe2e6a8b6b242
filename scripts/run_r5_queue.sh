#!/bin/bash
# Round-5 chip queue, phase C: hires host-vs-device learning A/B
# (VERDICT r4 item 2) then the bounded long-horizon stability run
# (item 5). Launch AFTER the interactive perf phase; sizes the
# long-horizon budget from the wall-clock deadline passed as $1
# (epoch seconds; default: now + 4h).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 14400 ))}

timeout 7200 python scripts/validate_learning.py --hires --task shapes_hard \
    --steps 4000 --host_aug > /tmp/hires_host.log 2>&1
timeout 7200 python scripts/validate_learning.py --hires --task shapes_hard \
    --steps 4000 > /tmp/hires_dev4k.log 2>&1

BUDGET=$(( DEADLINE - $(date +%s) - 600 ))   # 10 min tail margin
if [ "$BUDGET" -gt 1800 ]; then
  timeout $(( BUDGET + 300 )) python scripts/validate_learning.py --hires \
      --task shapes_hard --steps 20000 --eval_every 5000 \
      --max_seconds "$BUDGET" > /tmp/longrun.log 2>&1
fi
echo QUEUE_DONE > /tmp/r5_queue.done
