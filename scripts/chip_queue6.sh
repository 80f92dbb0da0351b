#!/bin/bash
# Sixth serialized TPU-chip queue (fresh VM 2026-08-19; chipq4/chipq5 were
# queued on the recycled VM and never ran).  Priorities this session:
#   1. bench — re-measure corpus RTF/DER with the jit-cache-key fix and the
#      sharpened spectral clustering (both landed after the last chip bench);
#      also fills the cold persistent compile cache for the driver.
#   2. proto5 — augmentation-annealed fine-tune of the shipped robust
#      encoder (low channel/competing probability, high SNR floor, small LR)
#      to restore fine in-domain discrimination on the 60 s heavy-tail seeds
#      without losing held-out robustness.  Both axes measured after.
#   3. segmentation overlap-weighted PIT-CE (chipq4's first experiment).
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq6_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq6] skip ${name} (done)"; return 0
  fi
  echo "[chipq6] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 3600 "$@" > "/tmp/chipq6_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq6] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq6] FAILED ${name} rc=$? — continuing"
  fi
}

echo "[chipq6] starting $(date -u)"

# 1. bench: corpus fix verification + compile-cache fill
stage bench python bench.py

# 2. augmentation-annealed fine-tune of the shipped robust encoder
stage proto5 python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_robust_stream.npz --steps 2000 --lr 1e-4 \
  --spk-batch 16 --competing-p 0.1 --channel-p 0.3 --snr-floor 15 \
  --out weights/ecapa_proto5_stream.npz

# 3. in-domain tail side-by-side: candidate vs shipped default (chip bf16)
stage tail5 python scripts/eval_tail.py --enc weights/ecapa_proto5_stream.npz
stage tail_robust python scripts/eval_tail.py --enc weights/ecapa_robust_stream.npz

# 4. held-out axis for the candidate
stage eval5 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto5_stream.npz

# 5. held-out refresh for the shipped default WITH sharpened clustering
stage eval_robust2 python scripts/eval_heldout.py

# 6. segmentation overlap-weighted PIT-CE (strongest single chipq4 arm)
stage seg_ow2 python scripts/train_mc.py segmentation --powerset \
  --steps 6000 --overlap-weight 2.0 \
  --src weights/segmentation_powerset.npz \
  --out weights/segmentation_ow2.npz
stage eval_ow2 python scripts/eval_segmentation.py \
  --weights weights/segmentation_ow2.npz

echo "[chipq6] queue complete $(date -u)"
