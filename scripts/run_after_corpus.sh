#!/bin/bash
# Supervisor: wait for the grounded corpus writer to finish (it writes
# relationships.json last), then run the full grounded pipeline.
# Exists because the round-3 host was reset between sessions (all of
# /root/data wiped), so corpus generation and the pipeline must re-run
# back-to-back unattended.
D=/root/data
while [ ! -f "$D/synthvg_grounded/relationships.json" ]; do sleep 60; done
sleep 15
echo "[supervisor $(date +%H:%M:%S)] corpus ready; starting pipeline"
bash /root/repo/scripts/grounded_pipeline.sh
