#!/bin/bash
# Round-end guard (wall-clock backstop). At the given epoch deadline it
# stops the whole measurement queue so the driver's bench/multichip runs
# find an idle host and a free relay terminal (MULTICHIP_r03 regressed to
# rc:124 precisely because certification ran on a contended host —
# VERDICT r3 item 1/weak 4; the XLA CPU collective 40 s rendezvous abort
# in NOTES.md is not configurable).
#
# Shutdown order matters:
#   1. relaunchers first (nanny, committer) so nothing respawns,
#   2. the supervisor shells (stops the while-relaunch loops),
#   3. leaf python processes via SIGTERM — cli.train installs a SIGTERM
#      handler that writes a preemption checkpoint before exiting,
#   4. wait for the checkpoint write, then commit the latest balanced
#      checkpoint + every results artifact as host-wipe insurance.
#
# Never kills by pattern (pkill/pgrep match our own session — repo rule);
# everything is resolved from PID files + the process tree.
DEADLINE=${1:?usage: round_end_guard.sh <epoch-deadline>}
cd /root/repo || exit 1
log() { echo "[guard $(date +%H:%M:%S)] $*"; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do sleep 30; done
log "deadline reached — stopping the measurement queue"

for f in /tmp/queue_nanny.pid /tmp/commit_results.pid; do
  p=$(cat "$f" 2>/dev/null)
  [ -n "$p" ] && kill "$p" 2>/dev/null && log "stopped $(basename "$f") ($p)"
done

descendants() {
  local c
  for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do
    descendants "$c"
    echo "$c"
  done
}

SUP=$(cat /tmp/session18.pid /tmp/session16.pid 2>/dev/null | head -1)
if [ -n "$SUP" ] && kill -0 "$SUP" 2>/dev/null; then
  TREE=$(descendants "$SUP")
  kill "$SUP" 2>/dev/null
  for p in $TREE; do kill "$p" 2>/dev/null; done
  log "SIGTERMed supervisor tree: $SUP $TREE"
  # Preemption checkpoint: give the trainer up to 5 min to write it.
  # Re-snapshot the tree each pass (ADVICE r4): a child forked by a
  # relaunch loop between the first snapshot and the kill would escape a
  # one-shot sweep and leave the host non-idle for the driver.
  for _ in $(seq 60); do
    TREE=$(descendants "$SUP"; echo "$TREE")
    alive=0
    for p in $TREE; do kill -0 "$p" 2>/dev/null && alive=1; done
    [ "$alive" -eq 0 ] && break
    sleep 5
  done
  TREE=$(descendants "$SUP"; echo "$TREE")
  for p in $TREE; do kill -9 "$p" 2>/dev/null; done
else
  log "queue supervisor not running (already complete?)"
fi

# --- Wipe insurance: commit the newest balanced checkpoint + artifacts ---
WD=/root/data/run_v3_bal0.7
CK=results/run_v3_bal0.7_ckpt
latest=$(ls "$WD/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
# Only replace the committed snapshot with a STRICTLY NEWER step (ADVICE
# r4: a hardcoded threshold would let a partial rerun's checkpoint
# clobber the committed step-100000 final).
committed=$(ls "$CK" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$latest" ] && [ "$latest" -gt "${committed:-0}" ] \
    && [ -f "$WD/checkpoints/$latest/_CHECKPOINT_METADATA" ]; then
  log "committing balanced checkpoint @$latest"
  find "$CK" -maxdepth 1 -type d -regex '.*/[0-9]+' -exec rm -rf {} +
  cp -r "$WD/checkpoints/$latest" "$CK/"
  cp -f "$WD/config.json" "$WD/vocab.json" "$CK/" 2>/dev/null
  sed -i "s/@ step [0-9]*/@ step $latest/; s|checkpoints/[0-9]*|checkpoints/$latest|" \
    "$CK/README.md" 2>/dev/null
  # balanced_train.sh's wipe-recovery block restores a hardcoded step dir;
  # point it at the new one (safe: the queue tree is dead by now, so no
  # bash process is mid-read in that file).
  prev=$(grep -o 'CKPT_GIT/[0-9]*' scripts/balanced_train.sh | head -1 | cut -d/ -f2)
  if [ -n "$prev" ] && [ "$prev" != "$latest" ]; then
    sed -i "s|CKPT_GIT/$prev|CKPT_GIT/$latest|g; s|checkpoint @$prev|checkpoint @$latest|" \
      scripts/balanced_train.sh
    git add scripts/balanced_train.sh >/dev/null 2>&1
  fi
fi
# One-shot final results snapshot (same filters as commit_results.sh).
D=/root/data; R=/root/repo/results
for f in "$D"/sweep_*.json "$D"/eval_*.json "$D"/v3_freq_baseline.txt "$D"/bench_*.txt; do
  [ -s "$f" ] && cp -f "$f" "$R/$(basename "$f")"
done
for lg in /root/data_session*.log; do
  [ -s "$lg" ] || continue
  grep -a -E "\[sgg\.(evaluate|generate|pretrain)\]|\[(session12|session11b|session18|balanced|encoder-ab|moe-measure|pipeline-v3) |freq_baseline|held-out|recall@|mR@|zsR@" \
    "$lg" | grep -a -v "step [0-9]*:" > "$R/$(basename "$lg" .log)_signal.log" 2>/dev/null
done
git add results >/dev/null 2>&1
git commit -q -m "round-end guard: final results + balanced checkpoint snapshot" \
  -- results scripts/balanced_train.sh \
  && log "committed final snapshot"
log "host left idle for the driver"
