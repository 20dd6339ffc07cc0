#!/bin/bash
# Transformer-decoder 100k arm (VERDICT r4 item 3, third attempt): the
# framework's second decoder gets a trained quality number on the same v3
# shards + eval protocol as the LSTM arms.
#
# Rotation-tax kill (VERDICT weak #1): data.feature_store_int8 quantizes
# the 21.3 GB f16 store to 9.9 GB int8+per-region-scale, which fits FULLY
# device-resident on the 16 GB v5e — zero steady-state relay uploads
# (vs ~70 s per 1000-step rotation = 13 effective steps/s in round 4) and
# no relay-client RSS leak growth. Max dequant error ≤ 1/127 of each
# region's absmax (tests/unit/test_device_pipeline.py). This is a NEW arm,
# not a cell of the round-4 A/B, so the input change is allowed; the
# uniform_v4 arm trains with the IDENTICAL store, keeping the
# decoder-architecture comparison protocol-clean within v4. ROT_MIN is a
# fallback if residency is disabled.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-100000}
ROT_MIN=${ROT_MIN:-10000}
DRMB=${DRMB:-12000000000}
INT8=${INT8:-true}
# Microbatched GP step: the 02:20 OOM measured 18.46 GB needed vs 15.75 GB
# usable = 9.28 GB resident store + ~9.2 GB transformer GP-step temps.
# grad_accum=4 cuts the temps ~4x (same gradients, lax.scan microbatches).
ACCUM=${ACCUM:-4}
WD="$D/run_v3_xf"
log() { echo "[xf-arm $(date +%H:%M:%S)] $*"; }
[ -f "$D/v3_shards/vocab.json" ] || { log "v3 shards missing"; exit 1; }

# --- Recipe-combo eval (runs first: cheap, decision-grade) -----------------
# The round-5 sweeps measured EMA+logp (+11% R@50, +27% zsR@50) and
# EMA+SWA(5) (+2.8% R@50) separately on the balanced checkpoint; this is
# the composed candidate headline recipe, full 4096-image protocol.
if [ -d "$D/run_v3_bal0.7/checkpoints" ] \
    && { [ ! -s "$D/sweep_recipe.json" ] || grep -q '"partial": true' "$D/sweep_recipe.json"; }; then
  log "recipe eval: balanced EMA + avg-last 5 + rank=logp"
  python -m sgg.cli.evaluate --workdir "$D/run_v3_bal0.7" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
    --rank logp --avg-last 5 --ema --zero-shot --per-predicate \
    --bootstrap 2000 --json-out "$D/sweep_recipe.json" --platform axon \
    || log "recipe eval failed (continuing to the train)"
  sleep 90
fi

if [ ! -d "$WD/checkpoints/$STEPS" ]; then
  log "train: transformer decoder, $STEPS steps, rot_min=$ROT_MIN drmb=$DRMB"
  attempt=0
  while :; do
    attempt=$((attempt + 1))
    python -m sgg.cli.train --config vg1k --workdir "$WD" \
      --platform axon \
      --set model.decoder=transformer \
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
      # Full-residency fallback: if the very first attempt dies before any
      # checkpoint (e.g. HBM OOM fitting the 9.9 GB int8 store next to the
      # transformer's activations), fall back to int8 ROTATING subsets —
      # still half the f16 upload bytes + ROT_MIN amortization.
      # (orbax creates checkpoints/ at init, so test for an actual saved
      # step, not the directory — the 02:20 OOM slipped past the dir test)
      if [ "$attempt" -eq 1 ] \
          && [ -z "$(ls "$WD/checkpoints" 2>/dev/null | grep -E '^[0-9]+$')" ] \
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

if [ ! -s "$D/eval_xf_ema.json" ] || grep -q '"partial": true' "$D/eval_xf_ema.json"; then
  log "eval: EMA (headline-comparable protocol)"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 --zero-shot \
    --bootstrap 2000 --json-out "$D/eval_xf_ema.json" --per-predicate --ema \
    || { log "EMA eval failed"; exit 1; }
  sleep 90
fi
if [ ! -s "$D/eval_xf_raw.json" ] || grep -q '"partial": true' "$D/eval_xf_raw.json"; then
  log "eval: raw"
  run_eval --workdir "$WD" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 --zero-shot \
    --bootstrap 2000 --json-out "$D/eval_xf_raw.json" --per-predicate \
    || { log "raw eval failed"; exit 1; }
fi
log "done"
