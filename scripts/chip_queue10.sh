#!/usr/bin/env bash
# Round-4 chip queue 10: clustering-margin encoder retrain (VERDICT #2).
# Waits for any running chip_queue9 to finish (ONE chip process at a time).
#   bash scripts/chip_queue10.sh 2>&1 | tee /tmp/chipq10.log
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/chipq9.pid ]; then
  while kill -0 "$(cat /tmp/chipq9.pid)" 2>/dev/null; do
    echo "waiting for chip_queue9 ($(date +%H:%M:%S))"; sleep 60
  done
fi

echo "=== [1/3] encoder-proto hard-pair warm retrain ==="
timeout 14000 python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_robust_stream.npz \
  --steps 4000 --lr 2e-4 --spk-batch 16 \
  --channel-p 0.7 --competing-p 0.3 --snr-floor 5 \
  --hard-pair-frac 0.4 \
  --out weights/ecapa_margin_stream.npz

echo "=== [2/3] bisection recalibration (writes refine_sub_cos meta) ==="
timeout 3600 python scripts/calibrate_bisect.py \
  --enc weights/ecapa_margin_stream.npz --domain both --write || true

echo "=== [3/3] 60 s tail + held-out eval for the margin encoder ==="
timeout 5400 python scripts/eval_tail.py \
  --enc weights/ecapa_margin_stream.npz \
  --seeds 2000 2001 2002 2003 2004 2005 2006 2007 2008 2009 2010 2011 || true
timeout 7200 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_margin_stream.npz || true

echo "=== chip_queue10 done ==="
