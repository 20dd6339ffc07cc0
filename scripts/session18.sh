#!/bin/bash
# Round-5 measurement queue (VERDICT r4 "Next round" order). Serial TPU,
# every stage idempotent; a killed session resumes by re-running this via
# scripts/launch_bg.sh.
#
# THIN SEQUENCER on purpose: bash reads a running script by byte offset, so
# this file must never be edited mid-queue — all substance lives in the
# per-stage scripts, which CAN be edited any time before their stage starts
# (the round-4 pattern: encoder_ab.sh grew a chained moe_measure while
# session12.sh was already running).
#
#   0. balanced RAW eval          (VERDICT Missing #3, ~25 min)
#   1. session11b sweeps          (VERDICT item 1 — the mR@100 lever)
#   2. transformer 100k arm       (VERDICT item 3 — first long run)
#   3. uniform v4 retrain + grid  (VERDICT item 1 "BOTH checkpoints")
#   4. encoder A/B + MoE          (VERDICT items 4+5)
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
log() { echo "[session18 $(date +%H:%M:%S)] $*"; }

# --- Stage 0: balanced RAW eval -------------------------------------------
if [ ! -s "$D/eval_bal_raw.json" ] || grep -q '"partial": true' "$D/eval_bal_raw.json"; then
  log "stage 0: balanced-arm RAW eval (completes the round-4 A/B)"
  bash scripts/stage_bal_raw_eval.sh || log "stage 0 FAILED (continuing)"
  sleep 90
else
  log "stage 0: skipped (eval_bal_raw.json complete)"
fi

# --- Stage 1: session11b sweep queue ---------------------------------------
log "stage 1: session11b sweeps"
bash scripts/session11b.sh || log "stage 1 reported failure (continuing)"
sleep 90

# --- Stage 2: transformer-decoder 100k arm ---------------------------------
log "stage 2: transformer-decoder arm"
bash scripts/xf_arm.sh || log "stage 2 reported failure (continuing)"
sleep 90

# --- Stage 3: uniform v4 retrain + uniform-model grid -----------------------
log "stage 3: uniform v4 arm"
bash scripts/uniform_v4.sh || log "stage 3 reported failure (continuing)"
sleep 90

# --- Stage 4: encoder A/B (chains moe_measure) ------------------------------
log "stage 4: encoder A/B + MoE measured run"
bash scripts/encoder_ab.sh || log "stage 4 reported failure"

log "queue complete"
