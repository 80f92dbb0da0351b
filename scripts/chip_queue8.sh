#!/usr/bin/env bash
# Round-3 chip queue 8 (v2): deep segmentation retrain (VERDICT #4).
# v1 (gru3+fc2) never reached step 1 — the 6-scan train graph hit axon's
# pathological scan-compile behavior (45 min in compile, killed).  v2 keeps
# the known-good 2-BiGRU scan count and adds capacity via width (96->128)
# and 2 FC layers (2.2x params), which compiles like every previous run.
#   bash scripts/chip_queue8.sh 2>&1 | tee /tmp/chipq8.log
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/2] deep segmentation train (128/128 gru2 fc2, ow 2.0) ==="
timeout 14000 python scripts/train_mc.py segmentation --powerset --cold \
  --seg-channels 128 --seg-hidden 128 --seg-gru 2 --seg-fc 2 \
  --steps 8000 --overlap-weight 2.0 \
  --out weights/segmentation_deep.npz

echo "=== [2/2] eval deep vs ow3 ==="
timeout 1800 python scripts/eval_segmentation.py \
  --weights weights/segmentation_deep.npz || true
