#!/bin/bash
# Watchdog launcher for TPU training runs.
#
# The tunneled axon TPU claim can wedge a freshly-started client forever
# (startup claim race; see .claude/skills/verify/SKILL.md). Symptom: the
# process sleeps at ~0% CPU and never reaches epoch 0. This wrapper
# starts the run, waits for the first metrics line, and kills + retries
# (up to MAX_TRIES) if none appears within GRACE seconds.
#
# Usage: scripts/tpu_run.sh <metrics_file> <total_timeout_s> <cmd...>
set -u
METRICS="$1"; shift
TOTAL="$1"; shift
GRACE=${GRACE:-420}
MAX_TRIES=${MAX_TRIES:-4}

for try in $(seq 1 "$MAX_TRIES"); do
  rm -f "$METRICS"
  "$@" &
  PID=$!
  start=$(date +%s)
  ok=0
  while kill -0 "$PID" 2>/dev/null; do
    now=$(date +%s); el=$((now - start))
    if [ -s "$METRICS" ]; then ok=1; break; fi
    if [ "$el" -ge "$GRACE" ]; then
      echo "tpu_run: no first epoch after ${el}s (try $try) — killing $PID" >&2
      kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      sleep 20   # let the server-side claim settle before reconnecting
      break
    fi
    sleep 5
  done
  if [ "$ok" = 1 ]; then
    # first epoch seen — wait for completion (bounded), and watch for
    # mid-run wedges: if the metrics file stops advancing for STALL
    # seconds, kill and keep the partial run
    STALL=${STALL:-300}
    end=$((start + TOTAL))
    while kill -0 "$PID" 2>/dev/null && [ "$(date +%s)" -lt "$end" ]; do
      sleep 10
      mt=$(stat -c %Y "$METRICS" 2>/dev/null || echo 0)
      now=$(date +%s)
      if [ "$mt" -gt 0 ] && [ $((now - mt)) -ge "$STALL" ]; then
        echo "tpu_run: metrics stalled ${STALL}s mid-run — killing $PID" >&2
        break
      fi
    done
    if kill -0 "$PID" 2>/dev/null; then
      echo "tpu_run: stopping $PID (timeout or stall)" >&2
      kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
    fi
    wait "$PID" 2>/dev/null
    exit 0
  fi
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null; rc=$?
    if [ -s "$METRICS" ]; then exit 0; fi
    echo "tpu_run: process exited rc=$rc without metrics (try $try)" >&2
    sleep 10
  fi
done
echo "tpu_run: giving up after $MAX_TRIES tries" >&2
exit 1
