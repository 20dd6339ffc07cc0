#!/bin/bash
# Predicate-balanced rerun of pipeline v3's train+eval stages (same seed-0
# grounded shards, same 100k-step protocol) to measure what
# data.predicate_balance buys on mR@k — the metric the uniform run is
# weakest on (BASELINE.md pipeline-v3: tail predicates at recall@100 ≈ 0.02
# vs head ≈ 0.39). Train-time resampling only; evaluation is unchanged.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
ALPHA=${ALPHA:-0.7}
STEPS=${STEPS:-100000}
WD="$D/run_v3_bal$ALPHA"
log() { echo "[balanced $(date +%H:%M:%S)] $*"; }

[ -f "$D/v3_shards/vocab.json" ] || { log "v3 shards missing"; exit 1; }

# Host-wipe recovery: the round-4 run COMPLETED all 100000 steps and the
# final checkpoint is IN GIT (results/run_v3_bal0.7_ckpt). Restoring it
# makes the train loop below a no-op (checkpoints/100000 exists -> rc=0)
# and the script proceeds straight to the evals.
CKPT_GIT=/root/repo/results/run_v3_bal0.7_ckpt
if [ "$ALPHA" = "0.7" ] && [ ! -d "$WD/checkpoints" ] \
    && [ -d "$CKPT_GIT/100000" ]; then
  log "restoring committed round-4 checkpoint @100000 from git"
  mkdir -p "$WD/checkpoints"
  cp -r "$CKPT_GIT/100000" "$WD/checkpoints/"
  cp "$CKPT_GIT/config.json" "$CKPT_GIT/vocab.json" "$WD/"
fi

# --- Re-queued short benches (session 13) ---------------------------------
# W2 re-run: bench_inference --quant crashed session 12 (HTTP 413 — ViT
# params were jit CONSTANTS; fixed to arguments). Runs here, before the
# multi-hour train, so the numbers land even if the host is wiped again.
if [ ! -s "$D/bench_quant2_axon.txt" ]; then
  log "bench: int8 PTQ encoder speedup (fixed params-as-arguments)"
  JAX_PLATFORMS=axon timeout 2400 python benchmarks/bench_inference.py --quant \
    > "$D/bench_quant2_axon.txt" 2>&1
  log "bench_quant2 rc=$? (file: $D/bench_quant2_axon.txt)"
  sleep 90
fi
# Binary serve protocol (new in session 13): JSON vs octet-stream SLOs.
if [ ! -s "$D/bench_serve_bin_axon.txt" ]; then
  log "bench: serve SLOs incl. binary protocol"
  JAX_PLATFORMS=axon timeout 1800 python benchmarks/bench_serve.py \
    > "$D/bench_serve_bin_axon.txt" 2>&1
  log "bench_serve rc=$? (file: $D/bench_serve_bin_axon.txt)"
  sleep 90
fi

log "train: alpha=$ALPHA, $STEPS steps (supervised relaunch loop)"
while :; do
  python -m sgg.cli.train --config vg1k --workdir "$WD" \
    --platform axon \
    --set data.source=shards --set "data.data_dir=$D/v3_shards" \
    --set model.compute_dtype=bfloat16 \
    --set train.batch_size=256 --set "train.total_steps=$STEPS" \
    --set train.log_every=200 --set train.checkpoint_every=2000 \
    --set data.rotation_min_steps=1000 \
    --set train.ema_decay=0.999 \
    --set "data.predicate_balance=$ALPHA" \
    --set train.eval_every=5000 \
    --set train.max_checkpoints=6 \
    --set train.host_rss_exit_gb=95
  rc=$?
  # Relay client can SIGABRT in C++ teardown AFTER a completed run; judge
  # success by the final checkpoint, not the exit code (pipeline_v3.sh).
  [ -d "$WD/checkpoints/$STEPS" ] && { rc=0; break; }
  { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || break; }; [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
  log "RSS watchdog handover — relaunching trainer (auto-resume)"
  sleep 60
done
[ "$rc" -eq 0 ] || { log "train failed rc=$rc"; exit 1; }
sleep 90

# Evals retry on rc 86: the evaluate CLI's stall watchdog exits 86 when a
# relay dispatch wedges; a retry from scratch after the claim window is
# cheaper than losing the whole measured arm.
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

log "eval: EMA first (comparable to the 0.2959 uniform headline), then raw"
run_eval --workdir "$WD" --split test \
  --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
  --bootstrap 2000 --json-out /root/data/eval_bal_ema.json \
  --per-predicate --ema || exit 1
sleep 90
run_eval --workdir "$WD" --split test \
  --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --predcls \
  --bootstrap 2000 --json-out /root/data/eval_bal_raw.json \
  --per-predicate || exit 1
log "done"
