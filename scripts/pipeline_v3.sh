#!/bin/bash
# Pipeline v3: grounded pixels->graphs with the SPATIAL pretrain task
# (per-cell owner labels from grounded boxes — teaches what+WHERE, which
# geometric predicates need). Goal: beat round-3's presence-pretrain result
# (held-out recall@50 0.2726 = 2.19x the 0.1244 frequency baseline).
#
# Self-contained after a host wipe: stage 0 regenerates the grounded corpus
# (seed 0 -> bit-identical JSON/images to the round-3 run, so the frequency
# baseline is comparable). Serial by design — ONE TPU process at a time with
# settle pauses (NOTES.md: relay terminals hold claims briefly after clean
# exits). Idempotent: each stage skips when its output exists.
cd /root/repo || exit 1
# APPEND to PYTHONPATH — overwriting drops /root/.axon_site (sitecustomize +
# relay plugin); an overwrite once killed a whole pipeline launch.
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
D=/root/data
STEPS=${STEPS:-100000}
PRETRAIN_STEPS=${PRETRAIN_STEPS:-40000}
log() { echo "[pipeline-v3 $(date +%H:%M:%S)] $*"; }
mkdir -p "$D"

if [ ! -f "$D/synthvg_grounded/relationships.json" ]; then
  log "stage 0: grounded corpus (108,077 JPEGs, CPU-only, ~40 min)"
  python -m sgg.cli.synth_corpus --out-dir "$D/synthvg_grounded" \
    --grounded --seed 0 || exit 1
else
  log "stage 0: skipped (relationships.json exists)"
fi

if [ ! -f "$D/enc_pretrain_v3/encoder_params.npz" ] \
    && [ -f /root/repo/results/enc_pretrain_v3_r4/encoder_params.npz ]; then
  log "stage 1: restoring committed round-4 pretrain checkpoint from git"
  mkdir -p "$D/enc_pretrain_v3"
  cp /root/repo/results/enc_pretrain_v3_r4/*.npz \
     /root/repo/results/enc_pretrain_v3_r4/*.json "$D/enc_pretrain_v3/"
fi

if [ ! -f "$D/enc_pretrain_v3/encoder_params.npz" ]; then
  log "stage 1: SPATIAL encoder pretrain ($PRETRAIN_STEPS steps)"
  # Relaunch loop: the relay can wedge a dispatch forever (a 40k run once
  # sat 80+ min at step 31k with 0 CPU). The pretrain CLI exits 86 on
  # stall and resumes from its --checkpoint-every resume file; wait out
  # the wedged-terminal claim window (~5-10 min) before relaunching.
  while :; do
    python -m sgg.cli.pretrain --vg-dir "$D/synthvg_grounded" \
      --image-dir "$D/synthvg_grounded/images" \
      --out-dir "$D/enc_pretrain_v3" --spatial on \
      --max-images 38400 --steps "$PRETRAIN_STEPS" --batch-size 64 \
      --log-every 500 --platform axon
    rc=$?
    [ -f "$D/enc_pretrain_v3/encoder_params.npz" ] && { rc=0; break; }
    [ "$rc" -eq 86 ] || break
    log "stage 1: stall watchdog fired — relaunching after claim window"
    sleep 420
  done
  [ "$rc" -eq 0 ] || exit 1
  sleep 90
else
  log "stage 1: skipped (encoder_params.npz exists)"
fi

if [ ! -f "$D/v3_shards/vocab.json" ]; then
  log "stage 2: preprocess — features through the spatial-pretrained encoder"
  python -m sgg.cli.preprocess --vg-dir "$D/synthvg_grounded" \
    --image-dir "$D/synthvg_grounded/images" \
    --encoder vgg19 --encoder-ckpt "$D/enc_pretrain_v3" \
    --feat-dtype float16 --out-dir "$D/v3_shards" \
    --platform axon || exit 1
  sleep 90
else
  log "stage 2: skipped (v3_shards exists)"
fi

log "stage 3: global-frequency recall baseline (the bar)"
python benchmarks/freq_baseline.py --data-dir "$D/v3_shards" --k 50 \
  | tee "$D/v3_freq_baseline.txt" || exit 1

# Shared-input mode: stages 0-3 rebuild the corpus/pretrain/shards other
# scripts depend on; the 100k train is skipped (session10.sh drives it).
if [ -n "$STOP_AFTER_BASELINE" ]; then
  log "STOP_AFTER_BASELINE set — skipping stages 4-5"
  exit 0
fi

log "stage 4: WGAN-GP train ($STEPS steps, rotating device-resident subsets)"
# Supervised relaunch loop: the relay PJRT client leaks every host->device
# transfer in host RSS; the trainer checkpoints and exits 75 before the OOM
# killer would SIGKILL it mid-step, and we relaunch with auto-resume.
while :; do
  python -m sgg.cli.train --config vg1k --workdir "$D/run_v3" \
    --platform axon \
    --set data.source=shards --set "data.data_dir=$D/v3_shards" \
    --set model.compute_dtype=bfloat16 \
    --set train.batch_size=256 --set "train.total_steps=$STEPS" \
    --set train.log_every=200 --set train.checkpoint_every=2000 \
    --set data.rotation_min_steps=1000 \
    --set train.ema_decay=0.999 \
    --set train.host_rss_exit_gb=95
  rc=$?
  # Relay client can SIGABRT in C++ teardown AFTER a completed run; judge
  # success by the final checkpoint, not the exit code.
  [ -d "$D/run_v3/checkpoints/$STEPS" ] && { rc=0; break; }
  { [ "$rc" -eq 75 ] || [ "$rc" -eq 86 ] || break; }; [ "$rc" -eq 86 ] && { log "stall watchdog (rc 86) — waiting out claim window"; sleep 360; }
  log "stage 4: RSS handover — relaunching trainer (auto-resume)"
  sleep 60
done
[ "$rc" -eq 0 ] || exit 1
sleep 90

log "stage 5: held-out image recall@50 (+ zero-shot; raw vs EMA weights)"
python -m sgg.cli.evaluate --workdir "$D/run_v3" --split test \
  --k 50 --num-samples 100 --batch-size 256 --zero-shot \
  --platform axon || exit 1
sleep 90
log "stage 5b: same eval through the EMA generator weights (decay 0.999)"
python -m sgg.cli.evaluate --workdir "$D/run_v3" --split test \
  --k 50 --num-samples 100 --batch-size 256 --zero-shot --ema \
  --platform axon || exit 1
log "done"
