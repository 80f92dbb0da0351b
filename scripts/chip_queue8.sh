#!/usr/bin/env bash
# Round-3 chip queue 8: deep segmentation retrain (VERDICT #4 quality push).
# The 96/96 2-BiGRU net plateaued at 0.86 best-perm across three recipes
# (powerset, ow2, ow3) — capacity, not steps, is the lever (pyannote's
# PyanNet: 4 BiLSTM x 128 + 2 FC).  Serialize ALL chip work.
#   bash scripts/chip_queue8.sh 2>&1 | tee /tmp/chipq8.log
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/2] deep segmentation train (128/128 gru3 fc2, ow 2.0) ==="
timeout 14000 python scripts/train_mc.py segmentation --powerset --cold \
  --seg-channels 128 --seg-hidden 128 --seg-gru 3 --seg-fc 2 \
  --steps 8000 --overlap-weight 2.0 \
  --out weights/segmentation_deep.npz

echo "=== [2/2] eval deep vs ow3 ==="
timeout 1800 python scripts/eval_segmentation.py \
  --weights weights/segmentation_deep.npz || true
