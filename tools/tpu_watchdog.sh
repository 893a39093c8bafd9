#!/bin/bash
# Launch a TPU job with automatic claim-hang recovery.
#
# The axon chip claim can hang FOREVER on a futex when started inside the
# (unpredictable, 2-30+ min) release window of the previous holder — see
# CLAUDE.md "Environment quirks". This wrapper starts the command
# detached and watches for a hang, distinguishing three states:
#   progress  = two non-banner log lines (one pre-claim print + one after
#               the first device op), OR the 8-min window elapsing with
#               the process NOT all-futex (e.g. a silent remote compile —
#               those block on network, not futex).
#   hang      = every thread in futex_do_wait continuously for 3 min with
#               no new log output (the documented claim-hang signature)
#               → kill, wait a 9-min quiet gap, retry (up to 5 attempts).
#   early exit= process exits during the poll window; rc=0 is a fast
#               clean run, nonzero is the transient claim error
#               ("Backend 'axon' is not in the list of known backends")
#               and is retried after the quiet gap.
# The job's real exit status is propagated as this script's exit status.
#
# Usage: tools/tpu_watchdog.sh <logfile> <cmd...>
#   tail -f <logfile>      job output
#   cat <logfile>.wd       watchdog attempt log
LOG=$1; shift

all_futex() {  # true if every thread of $1 is parked in futex_do_wait
  local pid=$1 w n=0 f=0
  for t in /proc/$pid/task/*/wchan; do
    [ -r "$t" ] || continue
    w=$(cat "$t" 2>/dev/null)
    n=$((n+1))
    case "$w" in *futex*) f=$((f+1));; esac
  done
  [ $n -gt 0 ] && [ $f -eq $n ]
}

for attempt in 1 2 3 4 5; do
  echo "[watchdog] attempt $attempt: $*" >> "$LOG.wd"
  setsid stdbuf -oL -eL "$@" > "$LOG" 2>&1 &
  PID=$!
  ok=0; futex_polls=0; prev_lines=-1
  for i in $(seq 1 32); do   # up to 8 min, 15 s polls
    sleep 15
    if ! kill -0 $PID 2>/dev/null; then ok=2; break; fi
    lines=$(grep -vc "xla_bridge\|experimental" "$LOG" 2>/dev/null)
    lines=${lines:-0}
    if [ "$lines" -ge 2 ]; then ok=1; break; fi
    if [ "$lines" -eq "$prev_lines" ] && all_futex $PID; then
      futex_polls=$((futex_polls+1))
    else
      futex_polls=0
    fi
    prev_lines=$lines
    if [ $futex_polls -ge 12 ]; then ok=3; break; fi   # 3 min all-futex
  done
  if [ $ok -eq 0 ] && ! all_futex $PID; then
    # 8 min, quiet, but not futex-parked: likely a long remote compile.
    # Do NOT wait unconditionally (a socket-wedged process would hang the
    # watchdog itself) — grant up to 20 more minutes, still watching for
    # output, exit, or a futex park.
    echo "[watchdog] 8 min silent but not all-futex — granting compile grace" >> "$LOG.wd"
    for i in $(seq 1 40); do
      sleep 30
      if ! kill -0 $PID 2>/dev/null; then ok=2; break; fi
      lines=$(grep -vc "xla_bridge\|experimental" "$LOG" 2>/dev/null)
      lines=${lines:-0}
      if [ "$lines" -ge 2 ]; then ok=1; break; fi
      if all_futex $PID; then ok=3; break; fi
    done
    if [ $ok -eq 0 ]; then
      echo "[watchdog] still silent after 28 min total — killing" >> "$LOG.wd"
      ok=3
    fi
  fi
  if [ $ok -eq 1 ]; then
    echo "[watchdog] progress detected, waiting for completion" >> "$LOG.wd"
    wait $PID; rc=$?
    echo "[watchdog] rc=$rc" >> "$LOG.wd"
    exit $rc
  fi
  if [ $ok -eq 2 ]; then
    wait $PID; rc=$?
    echo "[watchdog] early exit rc=$rc" >> "$LOG.wd"
    if [ $rc -eq 0 ]; then exit 0; fi
    echo "[watchdog] early failure — retrying after quiet gap" >> "$LOG.wd"
  else
    echo "[watchdog] claim hang (all-futex, no output) — killing $PID" >> "$LOG.wd"
    kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
  fi
  sleep 540   # 9 min quiet gap before retry
done
echo "[watchdog] giving up" >> "$LOG.wd"
exit 1
