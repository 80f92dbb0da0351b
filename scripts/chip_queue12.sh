#!/usr/bin/env bash
# Round-4 chip queue 12: (a) GENTLE clustering-margin fine-tune — the 0.4
# hard-pair mix was a measured negative (STATUS 2026-08-20); this is the
# 0.1/low-lr variant, ship-or-delete on the tail + held-out evals.
# (b) babble auto-route validation: demix_mc.npz is regenerated (+10.23 dB,
# chip_queue9), so the spectral router should now route babble files to the
# dialog stem with the DEFAULT config — measure it end-to-end.
# Waits for any running chip_queue11 (ONE chip process at a time).
#   bash scripts/chip_queue12.sh 2>&1 | tee /tmp/chipq12.log
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/chipq11.pid ]; then
  while kill -0 "$(cat /tmp/chipq11.pid)" 2>/dev/null; do
    echo "waiting for chip_queue11 ($(date +%H:%M:%S))"; sleep 60
  done
fi

echo "=== [1/4] gentle hard-pair margin fine-tune ==="
timeout 8000 python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_robust_stream.npz \
  --steps 2000 --lr 5e-5 --spk-batch 16 \
  --channel-p 0.7 --competing-p 0.3 --snr-floor 5 \
  --hard-pair-frac 0.1 \
  --out weights/ecapa_margin2_stream.npz

echo "=== [2/4] margin2 tail + held-out ship-or-delete evals ==="
timeout 5400 python scripts/eval_tail.py \
  --enc weights/ecapa_margin2_stream.npz \
  --seeds 2000 2001 2002 2003 2004 2005 2006 2007 2008 2009 2010 2011 || true
timeout 7200 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_margin2_stream.npz || true

echo "=== [3/4] babble auto-route end-to-end (DEFAULT config, armed demixer) ==="
timeout 5400 python scripts/eval_heldout.py \
  --domains heldout-babble5,heldout-babble15,heldout-white10 || true

echo "=== [4/4] shipped-default tail re-baseline (robust encoder) ==="
timeout 5400 python scripts/eval_tail.py \
  --seeds 2000 2001 2002 2003 2004 2005 2006 2007 2008 2009 2010 2011 || true

echo "=== chip_queue12 done ==="
