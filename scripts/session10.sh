#!/bin/bash
# Session-10 measurement driver (host wiped a 4th time — /root/data empty).
# Serial TPU schedule, every stage idempotent/resumable:
#   1. pipeline_v3 stages 0-3 (corpus -> spatial pretrain -> extract ->
#      frequency baseline) — rebuilds the shared inputs.
#   2. balanced_train.sh — predicate-balanced alpha=0.7, 100k steps
#      (session-9 queue item: targets mR@k, the measured weak metric).
#   3. encoder_ab.sh — frozen vs trainable backbone, 10k steps each
#      (measures the still-unmeasured train.train_encoder tier).
# A killed session resumes by just re-running this script.
cd /root/repo || exit 1
log() { echo "[session10 $(date +%H:%M:%S)] $*"; }

log "phase 1: pipeline_v3 stages 0-3"
STOP_AFTER_BASELINE=1 bash scripts/pipeline_v3.sh || { log "phase 1 failed"; exit 1; }

log "phase 2: predicate-balanced 100k train + eval"
bash scripts/balanced_train.sh || { log "phase 2 failed"; exit 1; }

log "phase 3: trainable-encoder A/B"
bash scripts/encoder_ab.sh || { log "phase 3 failed"; exit 1; }

log "all phases complete"
