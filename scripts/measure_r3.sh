#!/bin/bash
# Round-3 TPU measurement sweep (run AFTER the grounded pipeline frees the
# terminal; serial, one TPU process at a time with settle pauses).
#
#   A. kernel-tier benches: flash, conv (im2col/direct/1x1/s2), matmul,
#      fused decode vs XLA chain (VERDICT r2 items 2 & 7)
#   B. end-to-end step MFU for every encoder config (VERDICT r2 item 4)
#
# The conv_direct odd-n_bi on-chip check is NOT here — it goes last, alone,
# on a spare terminal group (NOTES.md quarantine: the pre-fix version of
# that shape wedged a terminal).
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
OUT=${OUT:-/root/data/measure_r3}
mkdir -p "$OUT"
log() { echo "[measure $(date +%H:%M:%S)] $*"; }

log "A: kernel benches"
python benchmarks/bench_kernels.py > "$OUT/kernels.jsonl" 2> "$OUT/kernels.err" \
  || { log "kernel bench FAILED (see $OUT/kernels.err)"; exit 1; }
sleep 60

for c in vg1k resnet50 vit_b16; do
  log "B: bench.py --config $c"
  python bench.py --config "$c" > "$OUT/bench_$c.json" 2> "$OUT/bench_$c.err" \
    || { log "bench $c FAILED"; exit 1; }
  sleep 60
done
log "done → $OUT"
