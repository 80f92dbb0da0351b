#!/usr/bin/env bash
# Round-5 chip queue 13 — VERDICT r4 directives, in ship-impact order:
#   #1 full-budget segmentation engine retrain (8000 steps, the committed
#      chip_queue11 recipe that the VM restart cut to 1600) -> conv8k,
#      judged as an ENGINE under the pinned protocol (eval_segmentation
#      --pinned, seg-eval-v1) with aggregation measured ON;
#   #6 demix_mc regeneration (arms the babble auto-route + un-skips the
#      babble5 demix gate);
#   #2 overlap-rescue ON bench + non-overlap-domain regression pass (the
#      measurement that gates flipping OverlapConfig.enabled);
#   #5 gentle hard-pair margin fine-tune (0.1 frac, lr 5e-5 — the r4 queue
#      lost to the VM restart), ship-or-delete on tail + held-out evals.
# Stages are started individually by the round driver (one chip process at
# a time); this script records the canonical commands.
#   bash scripts/chip_queue13.sh 2>&1 | tee /tmp/chipq13.log
set -uo pipefail
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

echo "=== [1/8] segmentation full-budget retrain (the 8000-step recipe) ==="
timeout 14000 python scripts/train_mc.py segmentation --powerset \
  --src weights/segmentation_xf.npz \
  --seg-arch xf --seg-xf 4 --seg-heads 4 --seg-ds 3 \
  --seg-channels 128 --seg-hidden 128 \
  --steps 8000 --overlap-weight 2.0 --seg-mixed --seg-conv-frac 0.5 \
  --out weights/segmentation_conv8k.npz
# ship step (2026-08-21): conv8k strictly dominated the 1600-step r4
# checkpoint (pinned frame 0.8905/0.8958/0.9042, engine DER 18.31 vs
# 22.14%, detector F1 0.812 vs 0.80) and was f16-compressed and shipped
# AS weights/segmentation_conv.npz; the conv8k working file was removed.

echo "=== [2/8] pinned-protocol seg eval: conv8k vs shipped conv1600 ==="
timeout 3600 python scripts/eval_segmentation.py --pinned \
  --weights weights/segmentation_conv8k.npz || true
timeout 3600 python scripts/eval_segmentation.py --pinned \
  --weights weights/segmentation_conv.npz || true

echo "=== [3/8] overlap-detector P/R: conv8k ==="
timeout 3600 python scripts/eval_overlap_det.py \
  --weights weights/segmentation_conv8k.npz || true

echo "=== [4/8] demix_mc regeneration (babble auto-route + gate) ==="
timeout 7200 python scripts/train_mc.py demix --steps 8000
python scripts/compress_weights.py weights/demix_mc.npz || true

echo "=== [5/8] overlap-rescue ON: all-domain regression pass ==="
SDTPU_EVAL_OVERLAP=1 timeout 7200 python scripts/eval_heldout.py \
  --domains heldout-overlap,indomain,heldout-dry,heldout-babble15,heldout-reverb3,heldout-white10 || true

echo "=== [6/8] bench with overlap rescue ON (pre-flip cost) ==="
SDTPU_BENCH_OVERLAP=1 timeout 5400 python bench.py 2>&1 | tail -30

echo "=== [7/8] gentle hard-pair margin fine-tune + ship-or-delete evals ==="
timeout 8000 python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_robust_stream.npz \
  --steps 2000 --lr 5e-5 --spk-batch 16 \
  --channel-p 0.7 --competing-p 0.3 --snr-floor 5 \
  --hard-pair-frac 0.1 \
  --out weights/ecapa_margin2_stream.npz
timeout 5400 python scripts/eval_tail.py \
  --enc weights/ecapa_margin2_stream.npz \
  --seeds 2000 2001 2002 2003 2004 2005 2006 2007 2008 2009 2010 2011 || true
timeout 7200 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_margin2_stream.npz || true

echo "=== [8/8] babble auto-route end-to-end (armed demixer, defaults) ==="
timeout 5400 python scripts/eval_heldout.py \
  --domains heldout-babble5,heldout-babble15,heldout-white10 || true

echo "=== chip_queue13 done ==="
