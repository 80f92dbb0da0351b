#!/usr/bin/env bash
# Round-3 chip queue (serialize ALL chip work — two concurrent TPU processes
# corrupt numerics silently, STATUS.md).  Run from the repo root:
#   bash scripts/chip_queue7.sh 2>&1 | tee /tmp/chipq7.log
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/5] headline bench (new 2s-grid + refine defaults) ==="
timeout 1800 python bench.py 2>/tmp/chipq7_bench.err
tail -2 /tmp/chipq7_bench.err || true

echo "=== [2/5] 1-hr config-4 bench (VERDICT #9) ==="
SDTPU_BENCH_FULL_S=3600 SDTPU_BENCH_BUDGET_S=600 SDTPU_BENCH_CORPUS=0 \
  SDTPU_BENCH_MFU=0 SDTPU_BENCH_FBANK=0 \
  timeout 1800 python bench.py 2>/dev/null

echo "=== [3/5] held-out domain re-baseline (new defaults) ==="
timeout 3600 python scripts/eval_heldout.py 2>/dev/null || true

echo "=== [4/5] segmentation eval: ow2 vs powerset (VERDICT #4) ==="
timeout 1200 python scripts/eval_segmentation.py \
  --weights weights/segmentation_ow2.npz 2>/dev/null || true
timeout 1200 python scripts/eval_segmentation.py \
  --weights weights/segmentation_powerset.npz 2>/dev/null || true

echo "=== [5/5] done ==="
