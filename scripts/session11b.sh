#!/bin/bash
# Session-11b TPU queue — chained behind session11.sh (pass its PID as $1).
# Two cheap eval-only sweeps on the balanced checkpoint:
#   A. Predicate logit-adjustment sweep (--predicate-adjust α on rank=logp):
#      the eval-time mR@k lever — measures the recall@k ↔ mR@k trade.
#   B. num-samples saturation (K = 25/50/100/200 at rank freq): grounds the
#      "k-sample ancestral sampling covers the 3-token space, no beam
#      needed" claim (sampler.py docstring) with a measured curve.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
SUP_PID=${SUP_PID:-${1:-}}
BWD="$D/run_v3_bal0.7"
log() { echo "[session11b $(date +%H:%M:%S)] $*"; }

if [ -n "$SUP_PID" ]; then
  log "waiting for session-11 queue (pid $SUP_PID) to finish"
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 120; done
  log "session-11 queue exited; settling 120s"
  sleep 120
fi

[ -d "$BWD/checkpoints" ] || { log "no balanced checkpoint"; exit 1; }

if [ ! -f "$D/adjust_ab.done" ]; then
  log "stage A: predicate logit-adjustment sweep (rank=logp, EMA, mR@100)"
  for a in 0.25 0.5 1.0; do
    log "stage A: alpha=$a"
    python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
      --rank logp --predicate-adjust "$a" --per-predicate --ema \
      --platform axon || { log "alpha=$a failed"; exit 1; }
    sleep 60
  done
  # the α=0 reference: rank=logp with --per-predicate for the same images
  python -m sgg.cli.evaluate --workdir "$BWD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
    --rank logp --per-predicate --ema --platform axon || exit 1
  touch "$D/adjust_ab.done"
  sleep 60
else
  log "stage A: skipped (done)"
fi

if [ ! -f "$D/ksat_ab.done" ]; then
  log "stage B: num-samples saturation (freq rank, EMA)"
  for k in 25 50 200; do   # 100 already measured by the rank sweep
    log "stage B: num-samples=$k"
    python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples "$k" --batch-size 256 --num-images 4096 \
      --ema --platform axon || { log "K=$k failed"; exit 1; }
    sleep 60
  done
  touch "$D/ksat_ab.done"
fi

log "all stages complete"
