#!/bin/bash
# Retry wrapper for TPU runs through the axon tunnel: the tunnel
# intermittently hangs a device fetch right after process start (observed
# round 5: the same command completes on retry). Usage:
#   watchdog_run.sh <logfile> <stall_secs> <max_tries> cmd args...
# Kills the run if the log stops growing for <stall_secs>, retries.
LOG=$1; STALL=$2; TRIES=$3; shift 3
for try in $(seq 1 "$TRIES"); do
  echo "[watchdog] ===== try $try =====" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 20
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG")
    if [ $((now - mt)) -gt "$STALL" ]; then
      echo "[watchdog] stalled ${STALL}s (try $try), killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 2; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait $PID; RC=$?
  if [ $RC -eq 0 ]; then echo "[watchdog] success on try $try" >> "$LOG"; exit 0; fi
  echo "[watchdog] exit $RC on try $try" >> "$LOG"
done
exit 1
