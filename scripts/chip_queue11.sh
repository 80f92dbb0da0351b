#!/usr/bin/env bash
# Round-4 chip queue 11: conversation-structured segmentation retrain — the
# overlap-DETECTOR fix (VERDICT #1's pipeline-level goal via segment/overlap).
# Waits for any running chip_queue10 to finish (ONE chip process at a time).
#   bash scripts/chip_queue11.sh 2>&1 | tee /tmp/chipq11.log
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/chipq10.pid ]; then
  while kill -0 "$(cat /tmp/chipq10.pid)" 2>/dev/null; do
    echo "waiting for chip_queue10 ($(date +%H:%M:%S))"; sleep 60
  done
fi

echo "=== [1/4] segmentation conv-mix retrain (warm from xf) ==="
# NOTE: r4 shipped this recipe at --steps 1600 (reduced budget after the
# 2026-08-20 VM restart); round 5 re-ran it at the full 8000 below
# (chip_queue13 stage 1) and THAT artifact is the shipped
# weights/segmentation_conv.npz — recipe and artifact match again.
timeout 14000 python scripts/train_mc.py segmentation --powerset \
  --src weights/segmentation_xf.npz \
  --seg-arch xf --seg-xf 4 --seg-heads 4 --seg-ds 3 \
  --seg-channels 128 --seg-hidden 128 \
  --steps 8000 --overlap-weight 2.0 --seg-mixed --seg-conv-frac 0.5 \
  --out weights/segmentation_conv.npz

echo "=== [2/4] overlap-detector P/R: conv vs xf ==="
timeout 3600 python scripts/eval_overlap_det.py \
  --weights weights/segmentation_conv.npz || true
timeout 3600 python scripts/eval_overlap_det.py \
  --weights weights/segmentation_xf.npz || true

echo "=== [3/4] segmentation frame/pipeline eval (conv) ==="
timeout 2400 python scripts/eval_segmentation.py \
  --weights weights/segmentation_conv.npz || true

echo "=== [4/4] overlap-rescue end-to-end: heldout-overlap + regression domains ==="
SDTPU_EVAL_OVERLAP=1 SDTPU_EVAL_OVERLAP_WEIGHTS=weights/segmentation_conv.npz \
  timeout 5400 python scripts/eval_heldout.py \
  --domains heldout-overlap,indomain,heldout-dry,heldout-babble15 || true
timeout 5400 python scripts/eval_heldout.py \
  --domains heldout-overlap || true

echo "=== chip_queue11 done ==="
