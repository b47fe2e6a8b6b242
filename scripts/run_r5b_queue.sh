#!/bin/bash
# Round-5 chip queue, phase B (resumed session): runs after the in-flight
# device-aug 4k leg (previous session's PID passed as $1) releases the chip.
#
# 1. hires HOST-aug learning leg (VERDICT r4 item 2) — a self-contained
#    2500-step schedule (anneal completes) instead of re-truncating 4000:
#    the first attempt timed out at 2650/4000 steps with no eval because
#    the single host core was shared with a full pytest run.
# 2. linear-probe bench row (VERDICT r4 item 7, last missing leg).
# 3. bounded long-horizon stability run (item 5): 20k steps @64px
#    shapes_hard — hires at 20k needs ~4.2h of chip and never fits; 64px
#    reaches the full step count so schedule-tail dynamics (teacher temp
#    warmup done, wd ramp, momentum->1) are actually observed.
set -u
cd "$(dirname "$0")/.."
PREV_PID=${1:-0}
PYTEST_PID=${2:-0}
DEADLINE=${3:-$(( $(date +%s) + 9000 ))}   # epoch seconds: stop chip work here

# Wait for the chip (previous runner) and the host core (pytest) to free up
# (the host-aug leg is PIL-bound on the single host core).
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
END_WAIT=$(( $(date +%s) + 1800 ))
while kill -0 "$PYTEST_PID" 2>/dev/null && [ "$(date +%s)" -lt "$END_WAIT" ]; do
  sleep 20
done

timeout 4200 python scripts/validate_learning.py --hires --task shapes_hard \
    --steps 2500 --host_aug --max_seconds 3600 > /tmp/r5_host2500.log 2>&1
echo "HOST2500_DONE_$?" >> /tmp/r5_status

timeout 900 python scripts/bench_evals.py > /tmp/r5_evalbench.log 2>&1
echo "EVALBENCH_DONE_$?" >> /tmp/r5_status

# The long-horizon run (item 5) is launched separately once the chip is
# verified free (scripts/run_r5_long.sh) so a bench/verify pass can slot
# in between without contending for the chip.
echo QUEUE_B_DONE >> /tmp/r5_status
