#!/bin/bash
# Session-11b TPU queue — eval-only sweeps on the balanced checkpoint.
# Since session 13 the evaluate CLI sweeps temperature×rank×alpha grids IN
# ONE PROCESS (temperature is a traced operand; rank/alpha are host-side
# re-rankings), so what session 12 queued as 7+4 separate invocations —
# each paying the relay's 20-40 s compile + feature pass — is now three:
#   0. rank × temperature grid (replaces session12.sh phase 3, which is
#      skipped via the rank_ab.done marker).
#   A. Predicate logit-adjustment sweep (--predicate-adjust α on rank=logp):
#      the eval-time mR@k lever — measures the recall@k ↔ mR@k trade.
#   B. num-samples saturation (K = 25/50/200 at rank freq): grounds the
#      "k-sample ancestral sampling covers the 3-token space, no beam
#      needed" claim (sampler.py docstring) with a measured curve. K
#      changes the compiled program, so these stay separate invocations.
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

if [ ! -f "$D/ranktemp_ab.done" ]; then
  log "stage 0: rank x temperature grid (9 combos, ONE process, EMA)"
  # Non-fatal: if the sweep path trips at scale, the rest of the queue
  # still runs and a later session re-measures.
  if python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
      --rank freq,freq_logp,logp --temperature 0.7,1.0,1.3 --ema \
      --bootstrap 2000 --zero-shot --exclude-seen sweep \
      --json-out "$D/sweep_ranktemp.json" --platform axon; then
    touch "$D/ranktemp_ab.done"
  else
    log "stage 0 FAILED (continuing; re-run in a later session)"
  fi
  sleep 90
else
  log "stage 0: skipped (done)"
fi

if [ ! -f "$D/adjust_ab.done" ]; then
  log "stage A: predicate logit-adjustment sweep (rank=logp, EMA, mR@100)"
  # One process: alpha=0 is the unadjusted reference in the same run.
  if python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
      --rank logp --predicate-adjust 0,0.25,0.5,1.0 --per-predicate --ema \
      --bootstrap 2000 \
      --json-out "$D/sweep_adjust.json" --platform axon; then
    touch "$D/adjust_ab.done"
  else
    log "stage A FAILED (continuing; re-run in a later session)"
  fi
  sleep 90
else
  log "stage A: skipped (done)"
fi

if [ ! -f "$D/swa_ab.done" ]; then
  log "stage C: offline SWA A/B (--avg-last 5 over the retained tail —"
  log "  train.max_checkpoints=6, every 2000 steps, so the window spans"
  log "  8k steps — vs the stage-0 EMA-only baseline, same 4096-image"
  log "  protocol)"
  if python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
      --avg-last 5 --ema --bootstrap 2000 --json-out "$D/sweep_swa.json" \
      --platform axon; then
    touch "$D/swa_ab.done"
  else
    log "stage C FAILED (continuing; re-run in a later session)"
  fi
  sleep 90
else
  log "stage C: skipped (done)"
fi

if [ ! -f "$D/ksat_ab.done" ]; then
  log "stage B: num-samples saturation curve (ONE process: draws are iid,"
  log "  smaller Ks are prefixes of the K=200 pass — same noise across Ks)"
  # batch 128 (not 256): both round-5 K=200 attempts at B=256 stalled the
  # relay at the FIRST batch (900 s watchdog, no error) — B×K = 256×200
  # doubles the parallel-decode width of every known-good pass; 128×200
  # equals the proven 256×100 envelope.
  if python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 25,50,100,200 --batch-size 128 \
      --num-images 4096 --ema --bootstrap 2000 --json-out "$D/sweep_ksat.json" \
      --platform axon; then
    touch "$D/ksat_ab.done"
  else
    log "stage B FAILED (continuing; re-run in a later session)"
  fi
fi

log "all stages complete"
