#!/bin/bash
# Queue nanny: relaunch the session queue supervisor when it dies before
# completing. The queue is idempotent (per-stage guards + resume
# checkpoints), so a relaunch is always safe; the cap bounds pathological
# crash loops. Kill BY PID (/tmp/queue_nanny.pid, the SESSION pidfile)
# before the driver's round-end bench/multichip runs.
#
# Round 5: targets scripts/session18.sh via scripts/launch_bg.sh (the safe
# standalone-nohup launcher — NOTES.md wrapper-PID pitfall).
cd /root/repo || exit 1
QUEUE=${QUEUE:-scripts/session18.sh}
PIDFILE=${PIDFILE:-/tmp/session18.pid}
LOG=${LOG:-/root/data_session18.log}
MAX=${MAX:-6}
n=0
log() { echo "[nanny $(date +%H:%M:%S)] $*"; }
while [ "$n" -lt "$MAX" ]; do
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; then
    sleep 120
    continue
  fi
  if tail -5 "$LOG" 2>/dev/null | grep -q "queue complete"; then
    log "queue complete — nanny exiting"
    exit 0
  fi
  n=$((n + 1))
  log "queue supervisor dead (relaunch $n/$MAX) — waiting out claim window"
  sleep 600
  bash scripts/launch_bg.sh "$PIDFILE" "$LOG" bash "$QUEUE"
  log "relaunched $QUEUE (pid $(cat "$PIDFILE"))"
  sleep 180
done
log "relaunch budget exhausted — manual attention needed"
