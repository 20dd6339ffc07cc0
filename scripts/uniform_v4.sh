#!/bin/bash
# Uniform (alpha=0) LSTM v4 retrain + uniform-model grid (VERDICT r4 item 1
# "BOTH checkpoints"): the round-3 uniform checkpoint died with a host wipe,
# so the predicate-adjust grid could only run on the balanced model. This
# retrains the uniform arm under the v4 schedule (same rotation settings as
# the transformer arm — decoder comparisons stay protocol-clean within v4)
# and runs the eval-time predicate-adjust sweep on it: does adjustment on
# the UNIFORM model dominate or stack with balanced retraining?
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-100000}
ROT_MIN=${ROT_MIN:-10000}
DRMB=${DRMB:-12000000000}
ACCUM=${ACCUM:-2}
INT8=${INT8:-true}
WD="$D/run_v4_uniform"
log() { echo "[uniform-v4 $(date +%H:%M:%S)] $*"; }
[ -f "$D/v3_shards/vocab.json" ] || { log "v3 shards missing"; exit 1; }

# ksat retry: session11b stage B died on a relay stall (exit 86, 01:15);
# the script is idempotent (done-markers skip landed stages) so this
# reruns only what's missing.
if [ ! -f "$D/ksat_ab.done" ]; then
  log "retrying session11b (ksat stage stalled earlier)"
  bash scripts/session11b.sh || log "session11b retry reported failure"
  sleep 90
fi

if [ ! -d "$WD/checkpoints/$STEPS" ]; then
  log "train: uniform LSTM v4, $STEPS steps, rot_min=$ROT_MIN drmb=$DRMB"
  attempt=0
  while :; do
    attempt=$((attempt + 1))
    python -m sgg.cli.train --config vg1k --workdir "$WD" \
      --platform axon \
      --set data.source=shards --set "data.data_dir=$D/v3_shards" \
      --set "data.device_resident_max_bytes=$DRMB" \
      --set "data.feature_store_int8=$INT8" \
      --set model.compute_dtype=bfloat16 \
      --set train.batch_size=256 --set "train.total_steps=$STEPS" \
      --set "train.grad_accum=$ACCUM" \
      --set train.log_every=200 --set train.checkpoint_every=2000 \
      --set "data.rotation_min_steps=$ROT_MIN" \
      --set train.ema_decay=0.999 \
      --set train.eval_every=5000 \
      --set train.max_checkpoints=6 \
      --set train.host_rss_exit_gb=95
    rc=$?
    [ -d "$WD/checkpoints/$STEPS" ] && { rc=0; break; }
    if [ "$rc" -ne 75 ] && [ "$rc" -ne 86 ]; then
      # Same full-residency → int8-rotating fallback as xf_arm.sh.
      if [ "$attempt" -eq 1 ] && [ -z "$(ls "$WD/checkpoints" 2>/dev/null | grep -E '^[0-9]+$')" ] \
          && [ "$DRMB" != "4000000000" ]; then
        DRMB=4000000000
        log "first attempt failed rc=$rc before any checkpoint — falling back to int8 rotating subsets (drmb=$DRMB)"
        sleep 120
        continue
      fi
      break
    fi
    [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
    log "watchdog handover — relaunching trainer (auto-resume)"
    sleep 60
  done
  [ "$rc" -eq 0 ] || { log "train failed rc=$rc"; exit 1; }
  sleep 90
else
  log "train already complete"
fi

run_eval() {
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

if [ ! -s "$D/eval_v4_uniform_ema.json" ] || grep -q '"partial": true' "$D/eval_v4_uniform_ema.json"; then
  log "eval: uniform v4 EMA (headline protocol)"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 --zero-shot \
    --bootstrap 2000 --json-out "$D/eval_v4_uniform_ema.json" \
    --per-predicate --ema || { log "EMA eval failed"; exit 1; }
  sleep 90
fi
if [ ! -s "$D/sweep_adjust_uniform.json" ] || grep -q '"partial": true' "$D/sweep_adjust_uniform.json"; then
  log "grid: predicate-adjust on the UNIFORM model (VERDICT item 1)"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
    --rank logp --predicate-adjust 0,0.25,0.5,1.0 --per-predicate --ema \
    --bootstrap 2000 --json-out "$D/sweep_adjust_uniform.json" \
    || { log "grid failed"; exit 1; }
fi
log "done"
