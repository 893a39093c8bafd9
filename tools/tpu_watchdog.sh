#!/bin/bash
# Launch a TPU job with automatic claim-hang recovery.
#
# The axon chip claim can hang FOREVER on a futex when started inside the
# (unpredictable, 2-30+ min) release window of the previous holder — see
# CLAUDE.md "Environment quirks". This wrapper starts the command
# detached, watches its log for progress beyond the axon banner, kills a
# silent start after 8 min and retries after a 9-min quiet gap (up to 5
# attempts). Progress = any log line that is not the xla_bridge banner,
# so put a print BEFORE the first device op in the target script.
#
# Usage: tools/tpu_watchdog.sh <logfile> <cmd...>
#   tail -f <logfile>      job output
#   cat <logfile>.wd       watchdog attempt log
# Retry a TPU command until its log shows progress; kill futex-hung starts.
# Usage: tpu_watchdog.sh <logfile> <cmd...>
LOG=$1; shift
for attempt in 1 2 3 4 5; do
  echo "[watchdog] attempt $attempt: $*" >> "$LOG.wd"
  setsid stdbuf -oL -eL "$@" > "$LOG" 2>&1 &
  PID=$!
  # wait up to 8 min for the log to grow beyond the axon banner (2 lines)
  ok=0
  for i in $(seq 1 32); do
    sleep 15
    if ! kill -0 $PID 2>/dev/null; then ok=2; break; fi
    lines=$(grep -vc "xla_bridge\|experimental" "$LOG" 2>/dev/null || echo 0)
    if [ "$lines" -gt 1 ]; then ok=1; break; fi
  done
  if [ $ok -ge 1 ]; then
    echo "[watchdog] progress detected (ok=$ok), waiting for completion" >> "$LOG.wd"
    wait $PID
    echo "[watchdog] rc=$?" >> "$LOG.wd"
    exit 0
  fi
  echo "[watchdog] no progress after 8 min — killing $PID" >> "$LOG.wd"
  kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
  sleep 540   # 9 min quiet gap before retry
done
echo "[watchdog] giving up" >> "$LOG.wd"
exit 1
