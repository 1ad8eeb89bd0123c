#!/bin/bash
# Gate a stream2 checkpoint: batch guard (v1-short fp) then streaming eval.
# Usage: ./scripts_gate_checkpoint.sh checkpoints/stream2/step_000500
set -e
CKPT=$1
echo "== batch guard: c2c-direct v1-short ($CKPT) =="
TILAWA_CHECKPOINT=$CKPT python -m tilawa_tpu.eval.runner \
  --experiment c2c-direct --corpus v1 --category short --no-save 2>&1 | tail -4
echo "== streaming: tracker v1 ($CKPT) =="
TILAWA_CHECKPOINT=$CKPT python -m tilawa_tpu.eval.validate_streaming \
  --corpus v1 --no-save 2>&1 | tail -3
