#!/bin/bash
# Session-11 TPU queue — chained behind session10.sh (whose supervisor may
# be a surviving process from a previous session; pass its PID as $1 or
# SUP_PID). Serial TPU schedule, every stage idempotent:
#   A. Transformer-decoder arm: 100k-step train on the v3 grounded shards +
#      eval (raw + EMA). The slot decoder is a shipped, parity-tested model
#      family whose END-TO-END QUALITY has never been measured — A/B against
#      the attention-LSTM headline (recall@50 0.2959 = 2.38x baseline).
#   B. Inference-tier measurements that exist in code but have no on-chip
#      numbers: bench_serve.py (HTTP SLOs through the dynamic batcher) and
#      bench_inference.py --quant (int8 PTQ encoder speedup vs bf16).
# A killed session resumes by re-running with the same args.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-100000}
SUP_PID=${SUP_PID:-${1:-}}
WD="$D/run_v3_xf"
log() { echo "[session11 $(date +%H:%M:%S)] $*"; }

if [ -n "$SUP_PID" ]; then
  log "waiting for session-10 supervisor (pid $SUP_PID) to finish"
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 120; done
  log "session-10 supervisor exited; settling 120s"
  sleep 120
fi

[ -f "$D/v3_shards/vocab.json" ] || { log "v3 shards missing"; exit 1; }

# Stage 0: ranking/temperature sweep on the balanced checkpoint — the first
# MEANINGFUL temperature measurement (the knob was inert until round 3's
# sample_temp fix) plus the new --rank orderings. Eval-only: cheap, and the
# winner applies retroactively to every trained checkpoint.
BWD="$D/run_v3_bal0.7"
if [ -d "$BWD/checkpoints" ] && [ ! -f "$D/rank_ab.done" ]; then
  log "stage 0: rank/temperature sweep (4096 held-out images, EMA weights)"
  for combo in freq:1.0 freq_logp:1.0 logp:1.0 freq:0.7 freq:1.3 \
               logp:0.7 logp:1.3; do
    r="${combo%%:*}"; t="${combo##*:}"
    log "stage 0: rank=$r temperature=$t"
    python -m sgg.cli.evaluate --workdir "$BWD" --split test \
      --k 20,50,100 --num-samples 100 --batch-size 256 --num-images 4096 \
      --rank "$r" --temperature "$t" --ema --platform axon \
      || { log "stage 0 combo $combo failed"; exit 1; }
    sleep 60
  done
  touch "$D/rank_ab.done"
  sleep 30
else
  log "stage 0: skipped (no balanced checkpoint yet, or already done)"
fi

if [ ! -d "$WD/checkpoints/$STEPS" ]; then
  log "stage A: transformer-decoder train ($STEPS steps, v3 shards)"
  while :; do
    python -m sgg.cli.train --config vg1k --workdir "$WD" \
      --platform axon \
      --set model.decoder=transformer \
      --set data.source=shards --set "data.data_dir=$D/v3_shards" \
      --set model.compute_dtype=bfloat16 \
      --set train.batch_size=256 --set "train.total_steps=$STEPS" \
      --set train.log_every=200 --set train.checkpoint_every=2000 \
      --set data.rotation_min_steps=1000 \
      --set train.ema_decay=0.999 \
      --set train.host_rss_exit_gb=95
    rc=$?
    # Relay client can SIGABRT in C++ teardown AFTER a completed run; judge
    # success by the final checkpoint, not the exit code (pipeline_v3.sh).
    [ -d "$WD/checkpoints/$STEPS" ] && { rc=0; break; }
    { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || break; }; [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
    log "stage A: RSS watchdog handover — relaunching trainer (auto-resume)"
    sleep 60
  done
  [ "$rc" -eq 0 ] || { log "stage A train failed rc=$rc"; exit 1; }
  sleep 90
else
  log "stage A: train already complete"
fi

log "stage A eval: raw + EMA, held-out, multi-k + zero-shot"
python -m sgg.cli.evaluate --workdir "$WD" --split test \
  --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot \
  --platform axon || exit 1
sleep 90
python -m sgg.cli.evaluate --workdir "$WD" --split test \
  --k 20,50,100 --num-samples 100 --batch-size 256 --zero-shot --ema \
  --platform axon || exit 1
sleep 90

log "stage B1: serving-tier SLOs (dynamic-batching HTTP server, on-chip)"
JAX_PLATFORMS=axon timeout 1200 python benchmarks/bench_serve.py \
  | tee "$D/bench_serve_axon.txt"
sleep 90

log "stage B2: int8 PTQ encoder speedup (vit_b16 + resnet50, on-chip)"
JAX_PLATFORMS=axon timeout 1800 python benchmarks/bench_inference.py --quant \
  | tee "$D/bench_quant_axon.txt"

log "all stages complete"
