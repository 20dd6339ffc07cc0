#!/bin/bash
# Queue nanny: relaunch scripts/session12.sh when its supervisor dies
# before completing. The queue is idempotent (per-stage guards + resume
# checkpoints), so a relaunch is always safe; the cap bounds pathological
# crash loops. Kill BY PID (/tmp/queue_nanny.pid, /tmp/session16.pid)
# before the driver's round-end bench/multichip runs.
cd /root/repo || exit 1
MAX=${MAX:-6}
n=0
log() { echo "[nanny $(date +%H:%M:%S)] $*"; }
while [ "$n" -lt "$MAX" ]; do
  PID=$(cat /tmp/session16.pid 2>/dev/null)
  if [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; then
    sleep 120
    continue
  fi
  if tail -5 /root/data_session16.log 2>/dev/null \
      | grep -q "all stages complete"; then
    log "queue complete — nanny exiting"
    exit 0
  fi
  n=$((n + 1))
  log "queue supervisor dead (relaunch $n/$MAX) — waiting out claim window"
  sleep 600
  nohup bash scripts/session12.sh >> /root/data_session16.log 2>&1 &
  echo $! > /tmp/session16.pid
  log "relaunched session12.sh (pid $(cat /tmp/session16.pid))"
  sleep 180
done
log "relaunch budget exhausted — manual attention needed"
