#!/usr/bin/env bash
# Round-4 chip queue 9: bench with cross-file corpus pipelining, the
# scan-free transformer segmentation trunk (VERDICT #1), and the demix_mc
# regeneration that arms the babble auto-route (VERDICT #5).
#   bash scripts/chip_queue9.sh 2>&1 | tee /tmp/chipq9.log
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/4] bench (corpus pipelining + sharded-ASP tail) ==="
timeout 5400 python bench.py 2>&1 | tail -40

echo "=== [2/4] segmentation xf train (128/128 xf4 ds3 ow2 mixed) ==="
timeout 14000 python scripts/train_mc.py segmentation --powerset --cold \
  --seg-arch xf --seg-xf 4 --seg-heads 4 --seg-ds 3 \
  --seg-channels 128 --seg-hidden 128 \
  --steps 8000 --overlap-weight 2.0 --seg-mixed \
  --out weights/segmentation_xf.npz

echo "=== [3/4] eval xf vs ow3 ==="
timeout 2400 python scripts/eval_segmentation.py \
  --weights weights/segmentation_xf.npz || true

echo "=== [4/4] demix_mc regeneration (arms the babble auto-route) ==="
timeout 7200 python scripts/train_mc.py demix --steps 8000

echo "=== chip_queue9 done ==="
