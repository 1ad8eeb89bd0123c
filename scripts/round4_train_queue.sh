#!/bin/bash
# Round-4 chip queue: wait for the phoneme fine-tune, then run stage A of
# the streaming-model campaign (from-scratch, full clips — the champion
# recipe that is known to escape the CTC blank minimum; crops joined in
# stage B from an early-stopped init).
set -u
PHONEME_PID=$(cat /tmp/phoneme.pid 2>/dev/null || echo "")
if [ -n "$PHONEME_PID" ]; then
  while kill -0 "$PHONEME_PID" 2>/dev/null; do sleep 20; done
fi
JAX_PLATFORMS='' python -m tilawa_tpu.train.train \
  --steps 10000 --lr 3e-4 --preset large --corpora v1,v2,v3 \
  --crop-prob 0.0 --weighting sqrt \
  --checkpoint-dir checkpoints/scratch-a --checkpoint-every 1000 --seed 4 \
  > logs/scratch_a.log 2>&1
