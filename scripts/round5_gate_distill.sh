#!/bin/bash
# Round-5: gate distill1 checkpoints once training exits.
# Batch guard (v1-short c2c-direct) + streaming v1 per checkpoint.
while kill -0 $(cat /tmp/distill1.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
for STEP in 006000 004000 002000; do
  CKPT=checkpoints/distill1/step_$STEP
  [ -d "$CKPT" ] || continue
  echo "== batch guard: c2c-direct v1-short ($CKPT) =="
  TILAWA_CHECKPOINT=$CKPT timeout 1200 python -m tilawa_tpu.eval.runner \
    --experiment c2c-direct --corpus v1 --category short --no-save 2>&1 | tail -3
  echo "== streaming v1 ($CKPT) =="
  TILAWA_CHECKPOINT=$CKPT timeout 2400 python -m tilawa_tpu.eval.validate_streaming \
    --corpus v1 --no-save 2>&1 | tail -3
done
echo "GATES DONE"
