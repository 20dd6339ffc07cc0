#!/bin/bash
# Trainable-encoder A/B (VERDICT r2 item 8 follow-through): does critic-driven
# backbone fine-tuning (train.train_encoder) improve held-out pixels->graphs
# recall over the same backbone FROZEN at its spatial-pretrain init?
#
# Both arms: vg_full config (vgg19 end-to-end), grounded corpus images,
# device-resident uint8 store (data.max_images caps the train split so the
# decoded corpus fits the HBM budget), identical seeds/protocol; the only
# variable is train.train_encoder. Evaluation is sgg.cli.generate
# --recall-k on the held-out split (the split now matches preprocess's, see
# DataConfig.split_seed) with EMA weights.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-10000}
MAXIMG=${MAXIMG:-20000}
log() { echo "[encoder-ab $(date +%H:%M:%S)] $*"; }

[ -f "$D/enc_pretrain_v3/encoder_params.npz" ] || {
  log "missing spatial-pretrain checkpoint (run pipeline_v3 stages 0-1)"; exit 1; }

# Round-5 arm retries (both scripts are idempotent — skip instantly when
# their checkpoints/evals exist): the 02:20 transformer OOM is fixed in
# xf_arm.sh (grad_accum=4 + real fallback); uniform_v4.sh re-runs here iff
# its first pass failed the same way.
if [ ! -s "$D/eval_xf_raw.json" ]; then
  log "retrying transformer arm (OOM fixed: grad_accum)"
  bash scripts/xf_arm.sh || log "xf arm retry failed (continuing)"
  sleep 90
fi
if [ ! -s "$D/eval_v4_uniform_ema.json" ] || [ ! -s "$D/sweep_adjust_uniform.json" ]; then
  log "retrying uniform v4 arm"
  bash scripts/uniform_v4.sh || log "uniform v4 retry failed (continuing)"
  sleep 90
fi
if [ ! -f "$D/ksat_ab.done" ]; then
  log "ksat final retry (stage B now at batch 128)"
  bash scripts/session11b.sh || log "ksat retry failed (continuing)"
  sleep 90
fi

run_arm() { # $1=workdir  $2=train_encoder
  local WD="$1" TE="$2"
  if [ -d "$WD/checkpoints/$STEPS" ]; then
    log "arm $WD: train already complete"; return 0
  fi
  while :; do
    python -m sgg.cli.train --config vg_full --workdir "$WD" \
      --platform axon \
      --encoder-ckpt "$D/enc_pretrain_v3" \
      --set "data.data_dir=$D/synthvg_grounded" \
      --set "data.max_images=$MAXIMG" \
      --set model.compute_dtype=bfloat16 \
      --set train.batch_size=64 --set "train.total_steps=$STEPS" \
      --set train.log_every=200 --set train.checkpoint_every=1000 \
      --set train.ema_decay=0.999 \
      --set "train.train_encoder=$TE" \
      --set train.host_rss_exit_gb=95
    rc=$?
    [ -d "$WD/checkpoints/$STEPS" ] && return 0
    { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || return "$rc"; }; [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
    log "RSS watchdog handover — relaunching (auto-resume)"
    sleep 60
  done
}

for arm in frozen:false trainable:true; do
  name="${arm%%:*}"; te="${arm##*:}"
  WD="$D/ab_enc_$name"
  log "=== arm: $name (train_encoder=$te) ==="
  run_arm "$WD" "$te" || { log "arm $name train failed"; exit 1; }
  sleep 90
  log "eval arm $name (EMA weights, held-out split, multi-k + zero-shot)"
  for try in 1 2 3; do
    python -m sgg.cli.evaluate --workdir "$WD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 64 --num-images 2048 \
      --predcls --json-out "/root/data/eval_encab_$name.json" \
      --zero-shot --ema --platform axon
    rc=$?
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 86 ] || { log "arm $name eval failed rc=$rc"; exit 1; }
    log "arm $name eval stall (rc 86) — retrying after claim window"
    sleep 420
  done
  [ "$rc" -eq 0 ] || { log "arm $name eval failed rc=$rc"; exit 1; }
  sleep 90
done
log "done — compare the two [sgg.generate] recall@50 lines above"

# Chained MoE measured run (VERDICT r3 item 6) — appended in round 4 so the
# RUNNING session12.sh (whose own bytes cannot be edited mid-read) picks it
# up when phase 5 invokes this script; it runs before the long transformer
# arm, matching the round's priority order.
bash scripts/moe_measure.sh || log "moe measure failed (queue continues)"
