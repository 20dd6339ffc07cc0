#!/bin/bash
# Balanced-arm RAW eval — the round-4 A/B protocol's missing cell (the EMA
# eval landed complete in results/eval_bal_ema.json; the RAW run was killed
# ~4 min before metrics by the zombie-guard launch bug, NOTES.md). Identical
# protocol to the EMA pass minus --ema.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
BWD="$D/run_v3_bal0.7"
log() { echo "[balanced $(date +%H:%M:%S)] $*"; }
[ -d "$BWD/checkpoints" ] || { log "no balanced checkpoint"; exit 1; }

for try in 1 2 3; do
  python -m sgg.cli.evaluate --workdir "$BWD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
    --bootstrap 2000 --json-out "$D/eval_bal_raw.json" --per-predicate \
    --platform axon
  rc=$?
  [ "$rc" -eq 0 ] && exit 0
  [ "$rc" -eq 86 ] || exit "$rc"
  log "eval stall (rc 86) — retrying after claim window"
  sleep 420
done
exit "$rc"
