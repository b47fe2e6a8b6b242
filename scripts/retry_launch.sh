#!/bin/bash
# Flaky-tunnel launcher: start a chip command, require a liveness marker in
# its log within INIT_WINDOW seconds, else kill and relaunch (wedged tunnel
# sessions never recover; fresh connects often do).
#   retry_launch.sh LOG MARKER INIT_WINDOW TOTAL_TIMEOUT CMD...
set -u
LOG=$1; MARKER=$2; WINDOW=$3; TOTAL=$4; shift 4
cd "$(dirname "$0")/.."
ATTEMPT=0
while :; do
  ATTEMPT=$(( ATTEMPT + 1 ))
  echo "attempt $ATTEMPT $(date +%T)" >> "${LOG}.launcher"
  timeout "$TOTAL" "$@" > "$LOG" 2>&1 &
  PID=$!
  T0=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    if grep -q "$MARKER" "$LOG" 2>/dev/null; then
      wait "$PID"; RC=$?
      echo "done rc=$RC attempt=$ATTEMPT $(date +%T)" >> "${LOG}.launcher"
      exit $RC
    fi
    if [ $(( $(date +%s) - T0 )) -gt "$WINDOW" ]; then
      echo "init stall, relaunching $(date +%T)" >> "${LOG}.launcher"
      kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
      # kill the grandchild python too (timeout's child)
      for c in $(cat /proc/*/stat 2>/dev/null | awk -v p="$PID" '$4==p {print $1}'); do
        kill -9 "$c" 2>/dev/null
      done
      break
    fi
  done
  if [ -n "$(grep -s "$MARKER" "$LOG")" ]; then
    # marker appeared but process exited in the poll gap
    echo "done-after-exit attempt=$ATTEMPT $(date +%T)" >> "${LOG}.launcher"
    exit 0
  fi
  sleep 10
done
