#!/bin/bash
# run_watchdog.sh cmd args...  — runs cmd, restarting it (up to
# WATCHDOG_RETRIES, default 3) whenever its CPU time stops advancing for
# WATCHDOG_STALL_S seconds (default 600).  Purpose: the axon TPU tunnel
# occasionally wedges a client on session handoff (all device calls hang,
# 0% CPU, ROADMAP r2 operational note); a fresh process reconnects fine.
RETRIES=${WATCHDOG_RETRIES:-3}
STALL_S=${WATCHDOG_STALL_S:-600}
# Heavy featurization fragments the glibc heap: 87 GB RSS observed on a
# pose-generation stage holding ~3 MB of live graphs (transient numpy
# buffers land on the brk heap and the freed space never returns to the
# OS), which OOM-killed the stage on the 125 GB box at 07:08.  Force
# allocations >=128 KB to mmap so frees are returned immediately.
export MALLOC_MMAP_THRESHOLD_=131072
export MALLOC_TRIM_THRESHOLD_=65536
for try in $(seq 1 "$RETRIES"); do
  "$@" &
  PID=$!
  last_cpu=-1
  stalled=0
  hung=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    cpu=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null)
    [ -z "$cpu" ] && break
    # threshold, not equality: a wedged tunnel client still accrues ~1 tick
    # per poll (observed: 1 tick/10s while hung in wait_woken), which would
    # reset a strict-equality stall counter forever
    if [ "$last_cpu" -ge 0 ] && [ $((cpu - last_cpu)) -le 3 ]; then
      stalled=$((stalled+30))
    else
      stalled=0
    fi
    last_cpu=$cpu
    if [ "$stalled" -ge "$STALL_S" ]; then
      echo "watchdog: no CPU progress for ${STALL_S}s; killing PID $PID (attempt $try/$RETRIES)" >&2
      hung=1
      kill "$PID" 2>/dev/null
      sleep 10
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"
  rc=$?
  if [ "$hung" = 0 ]; then exit "$rc"; fi
  sleep 20  # give the tunnel a moment before reconnecting
done
echo "watchdog: exhausted $RETRIES retries" >&2
exit 1
