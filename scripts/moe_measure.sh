#!/bin/bash
# MoE-ViT measured run (VERDICT r3 item 6: "make MoE real by training it
# once"). Two spatial-pretrain arms on the grounded corpus, identical
# protocol, the only variable is the MLP tier:
#   moe:   ViT 384/6/6 with 8-expert top-2 MoE MLP per block (GShard-style
#          routing, Switch aux loss @ train.moe_aux_coef) — ~8x the MLP
#          weight capacity at ~2x the active MLP FLOPs of dense.
#   dense: same 384/6/6 ViT, plain MLP — the control.
# Deliverables: held-out presence_recall / cell_acc per arm + img/s from
# the step logs (BASELINE.md table). EP-mesh parity at scale is
# environment-blocked (one relay chip); the EP exchange itself is pinned
# by tests/dist/test_expert_parallel.py on the 8-device virtual mesh.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-6000}
log() { echo "[moe-measure $(date +%H:%M:%S)] $*"; }

[ -f "$D/synthvg_grounded/relationships.json" ] || {
  log "grounded corpus missing"; exit 1; }

run_arm() { # $1=out_dir  $2=extra-args...
  local OUT="$1"; shift
  if [ -f "$OUT/encoder_params.npz" ]; then
    log "arm $OUT: already complete"; return 0
  fi
  while :; do
    python -m sgg.cli.pretrain --vg-dir "$D/synthvg_grounded" \
      --image-dir "$D/synthvg_grounded/images" \
      --out-dir "$OUT" --encoder vit_b16 --spatial on \
      --max-images 19200 --steps "$STEPS" --batch-size 64 \
      --log-every 250 --checkpoint-every 1000 --platform axon "$@"
    rc=$?
    [ -f "$OUT/encoder_params.npz" ] && return 0
    [ "$rc" -eq 86 ] || return "$rc"
    log "arm $OUT: stall watchdog — relaunching after claim window"
    sleep 420
  done
}

log "=== arm: moe (vit 384/6/6, 8 experts top-2) ==="
run_arm "$D/moe_pretrain" --vit-dims 384,6,6 --moe-experts 8 --moe-top-k 2 \
  || { log "moe arm failed"; exit 1; }
sleep 90
log "=== arm: dense control (vit 384/6/6) ==="
run_arm "$D/moe_dense_ctl" --vit-dims 384,6,6 \
  || { log "dense arm failed"; exit 1; }
log "done — compare the two held-out lines + img/s in the logs"

# Chained: FULL-SPLIT confirmation of the promoted headline recipe
# (balanced EMA + SWA5 + logp measured R@50 0.3043 at 4096 images —
# this pins the headline number on all 10,808 test images).
D=/root/data
if [ -d "$D/run_v3_bal0.7/checkpoints" ] \
    && { [ ! -s "$D/eval_recipe_full.json" ] || grep -q '"partial": true' "$D/eval_recipe_full.json"; }; then
  log "full-split recipe eval (headline confirmation)"
  python -m sgg.cli.evaluate --workdir "$D/run_v3_bal0.7" --split test \
    --k 20,50,100 --num-samples 100 --batch-size 256 \
    --rank logp --avg-last 5 --ema --zero-shot --per-predicate \
    --bootstrap 2000 --json-out "$D/eval_recipe_full.json" --platform axon \
    || log "full-split recipe eval failed (4096-image number stands)"
  sleep 90
fi

# Chained round-5 stretch: balanced arms under the v4 int8-resident protocol
# (same mid-queue chaining pattern as encoder_ab.sh -> this script).
# alpha=0.7 completes the clean same-protocol pair vs uniform_v4; alpha=1.0
# probes the remaining train-side lever toward mR@100 >= 0.25 (the
# eval-time adjust lever measured flat — BASELINE.md round-5 sweep 2).
bash scripts/extra_v4.sh || log "bal-v4 stretch failed (queue continues)"
ALPHA=1.0 EVAL_JSON=/root/data/eval_v4_bal1.0_ema.json \
  bash scripts/extra_v4.sh || log "bal-v4 alpha=1.0 stretch failed"
