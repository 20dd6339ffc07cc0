#!/bin/bash
# Results committer (VERDICT r3 item 2: "make results land durably").
# The host has been wiped 6+ times mid-round; everything in /root/data dies
# with it. This loop snapshots every measurement artifact the session-12
# queue produces into the git workdir and commits it the moment it changes,
# so numbers survive any wipe that happens after they are printed.
#
# Commits are paths-limited (`git commit -- results/`) so a concurrent
# interactive commit in the same repo is never swept into the snapshot.
cd /root/repo || exit 1
D=/root/data
R=/root/repo/results
mkdir -p "$R"
log() { echo "[commit-results $(date +%H:%M:%S)] $*"; }

snapshot() {
  # Small JSON/text artifacts: copy whole.
  for f in "$D"/sweep_*.json "$D"/eval_*.json "$D"/v3_freq_baseline.txt "$D"/bench_*.txt \
           "$D"/enc_pretrain_v3/pretrain_meta.json "$D"/moe_pretrain/pretrain_meta.json "$D"/moe_dense_ctl/pretrain_meta.json; do
    [ -s "$f" ] && cp -f "$f" "$R/$(basename "$f")"
  done
  # The session log carries every eval/train stdout line (evaluate prints
  # its recall tables there). Keep the signal lines only — the raw log has
  # hundreds of thousands of step lines.
  for lg in /root/data_session*.log; do
    [ -s "$lg" ] || continue
    grep -a -E "\[sgg\.(evaluate|generate|pretrain)\]|\[(session12|session11b|session18|balanced|encoder-ab|moe-measure|pipeline-v3) |freq_baseline|held-out|recall@|mR@|zsR@" \
      "$lg" | grep -a -v "step [0-9]*:" > "$R/$(basename "$lg" .log)_signal.log" 2>/dev/null
  done
}

while :; do
  snapshot
  if ! git diff --quiet -- results 2>/dev/null \
     || [ -n "$(git status --porcelain -- results)" ]; then
    git add results >/dev/null 2>&1
    git commit -q -m "measurement queue: results snapshot ($(date +%H:%M))" -- results \
      && log "committed results snapshot"
  fi
  sleep 180
done
