#!/bin/bash
# Round-5 measurement queue (VERDICT r4 "Next round" order). Serial TPU,
# every stage idempotent behind a marker/artifact check; a killed session
# resumes by re-running this script via scripts/launch_bg.sh.
#
#   0. balanced RAW eval      — completes the round-4 A/B protocol
#                               (VERDICT Missing #3, ~25 min)
#   1. session11b sweeps      — ranktemp(+exclude-seen)/predicate-adjust/
#                               SWA/ksat grids on the balanced checkpoint
#                               (VERDICT item 1 — the mR@100>=0.25 lever)
#   2. transformer 100k arm   — first among the long runs (VERDICT item 3),
#                               with the full-store HBM residency fix
#                               (DRMB) replacing the 20x rotation tax
#   3. uniform v4 retrain     — only if stage 2's train proved fast
#                               (residency working): gives the grid its
#                               uniform-model cells (VERDICT item 1 "BOTH")
#   4. encoder A/B            — frozen vs finetuned (VERDICT item 4);
#                               encoder_ab.sh chains moe_measure (item 5)
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
# Full-store device residency: the v3 feature store is 21 GB; when HBM
# allows (probed at session start) DRMB covers it and training never
# re-uploads a subset — the measured alternative was ~70 s of relay upload
# per 1000 steps (13 effective steps/s) plus ~100% of every upload leaked
# into host RSS (NOTES.md relay leak -> round-4's RSS handover at ~74k).
DRMB=${DRMB:-24000000000}
log() { echo "[session18 $(date +%H:%M:%S)] $*"; }

run_eval() { # retry rc-86 stalls; args passed through
  local try rc
  for try in 1 2 3; do
    python -m sgg.cli.evaluate "$@" --platform axon; rc=$?
    [ "$rc" -eq 0 ] && return 0
    [ "$rc" -eq 86 ] || return "$rc"
    log "eval stall (rc 86) — retrying after claim window"
    sleep 420
  done
  return "$rc"
}

# --- Stage 0: balanced RAW eval -------------------------------------------
BWD="$D/run_v3_bal0.7"
if [ ! -s "$D/eval_bal_raw.json" ] || grep -q '"partial": true' "$D/eval_bal_raw.json"; then
  log "stage 0: balanced-arm RAW eval (completes the round-4 A/B)"
  run_eval --workdir "$BWD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
    --bootstrap 2000 --json-out "$D/eval_bal_raw.json" --per-predicate \
    || log "stage 0 FAILED (continuing)"
  sleep 90
else
  log "stage 0: skipped (eval_bal_raw.json complete)"
fi

# --- Stage 1: session11b sweep queue ---------------------------------------
log "stage 1: session11b sweeps"
bash scripts/session11b.sh || log "stage 1 reported failure (continuing)"
sleep 90

# --- Stage 2: transformer-decoder 100k arm ---------------------------------
STEPS=${STEPS:-100000}
WD="$D/run_v3_xf"
T_START=$(date +%s)
if [ ! -d "$WD/checkpoints/$STEPS" ]; then
  log "stage 2: transformer-decoder train ($STEPS steps, v3 shards, full-store residency)"
  while :; do
    python -m sgg.cli.train --config vg1k --workdir "$WD" \
      --platform axon \
      --set model.decoder=transformer \
      --set data.source=shards --set "data.data_dir=$D/v3_shards" \
      --set "data.device_resident_max_bytes=$DRMB" \
      --set model.compute_dtype=bfloat16 \
      --set train.batch_size=256 --set "train.total_steps=$STEPS" \
      --set train.log_every=200 --set train.checkpoint_every=2000 \
      --set data.rotation_min_steps=1000 \
      --set train.ema_decay=0.999 \
      --set train.eval_every=5000 \
      --set train.max_checkpoints=6 \
      --set train.host_rss_exit_gb=95
    rc=$?
    [ -d "$WD/checkpoints/$STEPS" ] && { rc=0; break; }
    { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || break; }
    [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
    log "stage 2: watchdog handover — relaunching trainer (auto-resume)"
    sleep 60
  done
  [ "$rc" -eq 0 ] || { log "stage 2 train failed rc=$rc"; exit 1; }
  sleep 90
else
  log "stage 2: train already complete"
fi
T_TRAIN=$(( $(date +%s) - T_START ))

if [ ! -s "$D/eval_xf_ema.json" ] || grep -q '"partial": true' "$D/eval_xf_ema.json"; then
  log "stage 2 eval: EMA (headline-comparable protocol)"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
    --bootstrap 2000 --json-out "$D/eval_xf_ema.json" --per-predicate --ema \
    || log "stage 2 EMA eval FAILED (continuing)"
  sleep 90
fi
if [ ! -s "$D/eval_xf_raw.json" ] || grep -q '"partial": true' "$D/eval_xf_raw.json"; then
  log "stage 2 eval: raw"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
    --bootstrap 2000 --json-out "$D/eval_xf_raw.json" --per-predicate \
    || log "stage 2 raw eval FAILED (continuing)"
  sleep 90
fi

# --- Stage 3: uniform v4 retrain + grid (residency-gated stretch) ----------
# Only worth it if the residency fix held: a fresh uniform train gives the
# session11b grid its uniform-model cells (the round-3 uniform checkpoint
# died with a host wipe; VERDICT item 1 wants the grid on BOTH models).
UWD="$D/run_v4_uniform"
if [ "$T_TRAIN" -lt 2700 ] || [ -d "$UWD/checkpoints" ]; then
  if [ ! -d "$UWD/checkpoints/$STEPS" ]; then
    log "stage 3: uniform v4 retrain (residency fix held: stage-2 train ${T_TRAIN}s)"
    while :; do
      python -m sgg.cli.train --config vg1k --workdir "$UWD" \
        --platform axon \
        --set data.source=shards --set "data.data_dir=$D/v3_shards" \
        --set "data.device_resident_max_bytes=$DRMB" \
        --set model.compute_dtype=bfloat16 \
        --set train.batch_size=256 --set "train.total_steps=$STEPS" \
        --set train.log_every=200 --set train.checkpoint_every=2000 \
        --set data.rotation_min_steps=1000 \
        --set train.ema_decay=0.999 \
        --set train.eval_every=5000 \
        --set train.max_checkpoints=6 \
        --set train.host_rss_exit_gb=95
      rc=$?
      [ -d "$UWD/checkpoints/$STEPS" ] && { rc=0; break; }
      { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || break; }
      [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
      log "stage 3: watchdog handover — relaunching trainer (auto-resume)"
      sleep 60
    done
    [ "$rc" -eq 0 ] || log "stage 3 train failed rc=$rc (continuing to stage 4)"
    sleep 90
  fi
  if [ -d "$UWD/checkpoints/$STEPS" ]; then
    if [ ! -s "$D/eval_v4_uniform_ema.json" ] || grep -q '"partial": true' "$D/eval_v4_uniform_ema.json"; then
      log "stage 3 eval: uniform v4 EMA (headline protocol)"
      run_eval --workdir "$UWD" --split test \
        --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
        --bootstrap 2000 --json-out "$D/eval_v4_uniform_ema.json" \
        --per-predicate --ema || log "stage 3 eval FAILED (continuing)"
      sleep 90
    fi
    if [ ! -s "$D/sweep_adjust_uniform.json" ] || grep -q '"partial": true' "$D/sweep_adjust_uniform.json"; then
      log "stage 3 grid: predicate-adjust on the UNIFORM model (VERDICT item 1)"
      run_eval --workdir "$UWD" --split test \
        --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
        --rank logp --predicate-adjust 0,0.25,0.5,1.0 --per-predicate --ema \
        --bootstrap 2000 --json-out "$D/sweep_adjust_uniform.json" \
        || log "stage 3 grid FAILED (continuing)"
      sleep 90
    fi
  fi
else
  log "stage 3: skipped (stage-2 train took ${T_TRAIN}s — residency fix not confirmed)"
fi

# --- Stage 4: encoder A/B (chains moe_measure) ------------------------------
log "stage 4: encoder A/B + MoE measured run"
bash scripts/encoder_ab.sh || log "stage 4 reported failure"

log "queue complete"
