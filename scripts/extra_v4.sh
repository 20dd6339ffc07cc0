#!/bin/bash
# Balanced (alpha=0.7) arm under the v4 protocol (int8 fully-resident
# feature store) — chained after moe_measure as round-5 stretch work.
# Together with uniform_v4.sh this yields a clean SAME-PROTOCOL pair:
#   uniform-v4 vs balanced-v4  -> the balance trade WITHOUT the v3
#                                 rotation-schedule confound
#   uniform-v4 vs uniform-v3   -> the int8-store + schedule effect alone
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-100000}
DRMB=${DRMB:-12000000000}
ACCUM=${ACCUM:-2}
ALPHA=${ALPHA:-0.7}
WD="$D/run_v4_bal$ALPHA"
EVAL_JSON=${EVAL_JSON:-$D/eval_v4_bal_ema.json}
log() { echo "[bal-v4 $(date +%H:%M:%S)] $*"; }
[ -f "$D/v3_shards/vocab.json" ] || { log "v3 shards missing"; exit 1; }

if [ ! -d "$WD/checkpoints/$STEPS" ]; then
  log "train: balanced v4 (alpha=0.7, int8 resident), $STEPS steps"
  attempt=0
  while :; do
    attempt=$((attempt + 1))
    python -m sgg.cli.train --config vg1k --workdir "$WD" \
      --platform axon \
      --set data.source=shards --set "data.data_dir=$D/v3_shards" \
      --set "data.device_resident_max_bytes=$DRMB" \
      --set data.feature_store_int8=true \
      --set "data.predicate_balance=$ALPHA" \
      --set model.compute_dtype=bfloat16 \
      --set train.batch_size=256 --set "train.total_steps=$STEPS" \
      --set "train.grad_accum=$ACCUM" \
      --set train.log_every=200 --set train.checkpoint_every=2000 \
      --set data.rotation_min_steps=10000 \
      --set train.ema_decay=0.999 \
      --set train.eval_every=5000 \
      --set train.max_checkpoints=6 \
      --set train.host_rss_exit_gb=95
    rc=$?
    [ -d "$WD/checkpoints/$STEPS" ] && { rc=0; break; }
    if [ "$rc" -ne 75 ] && [ "$rc" -ne 86 ]; then
      if [ "$attempt" -eq 1 ] && [ -z "$(ls "$WD/checkpoints" 2>/dev/null | grep -E '^[0-9]+$')" ] \
          && [ "$DRMB" != "4000000000" ]; then
        DRMB=4000000000
        log "first attempt failed rc=$rc — int8 rotating fallback"
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

if [ ! -s "$EVAL_JSON" ] || grep -q '"partial": true' "$EVAL_JSON"; then
  log "eval: balanced v4 (alpha=$ALPHA) EMA, headline protocol"
  for try in 1 2 3; do
    python -m sgg.cli.evaluate --workdir "$WD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 --zero-shot \
      --bootstrap 2000 --json-out "$EVAL_JSON" \
      --per-predicate --ema --platform axon
    rc=$?
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 86 ] || { log "eval failed rc=$rc"; exit "$rc"; }
    log "eval stall (rc 86) — retrying after claim window"
    sleep 420
  done
fi
log "done"
