#!/bin/bash
# Second serialized TPU-chip work queue (round 2, post-demix agenda).
# Same discipline as chip_queue.sh: one stage = one fresh process, strictly
# sequential, idempotent /tmp/chipq2_done_<name> markers, logs at
# /tmp/chipq2_<name>.log.  WAITS for the in-flight demix training
# (/tmp/train_demix.pid) instead of killing it.
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq2_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq2] skip ${name} (done)"; return 0
  fi
  echo "[chipq2] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "/tmp/chipq2_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq2] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq2] FAILED ${name} rc=$? — continuing"
  fi
}

# 0. wait (do not kill!) for the chip demix training to finish.
if [ -f /tmp/train_demix.pid ]; then
  pid="$(cat /tmp/train_demix.pid)"
  while kill -0 "$pid" 2>/dev/null; do
    echo "[chipq2] waiting for demix training (pid $pid) $(date -u +%H:%M:%S)"
    sleep 60
  done
fi
echo "[chipq2] chip free — starting $(date -u)"

# 1. segmentation capacity ladder: 128/128 powerset, 6000 steps (geometry
#    mismatch vs the 96/96 src forces a cold start by design).  Separate
#    output file — ship decision happens after eval.
stage seg128 python scripts/train_mc.py segmentation --powerset \
  --steps 6000 --seg-channels 128 --seg-hidden 128 \
  --src weights/segmentation_powerset.npz \
  --out weights/segmentation_powerset128.npz

stage eval_seg128 python scripts/eval_segmentation.py \
  --weights weights/segmentation_powerset128.npz

# 2. encoder experiment A: continue the held-out champion (proto_small,
#    128 ch, CPU 2500 steps) for 4000 more chip steps on the same recipe —
#    tests whether the in-domain gap (13.9% vs r1 0.64%) is a step-budget
#    artifact.
stage proto4a python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_proto_small.npz --steps 4000 --spk-batch 16 \
  --competing-p 0.3 --channel-p 0.7 --snr-floor 5 \
  --out weights/ecapa_proto4a_stream.npz

stage calib4a python scripts/calibrate_bisect.py \
  --enc weights/ecapa_proto4a_stream.npz --domain both --write

stage eval4a python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto4a_stream.npz

# 3. encoder experiment B: capacity midpoint — 256-ch cold on the same
#    fixed mixed-family recipe (128 ch generalizes, 512 ch failed: find the
#    ladder's knee).
stage proto4b python scripts/train_mc.py encoder-proto --cold \
  --proto-channels 256 --steps 4000 --spk-batch 16 \
  --competing-p 0.3 --channel-p 0.7 --snr-floor 5 \
  --out weights/ecapa_proto4b_stream.npz

stage calib4b python scripts/calibrate_bisect.py \
  --enc weights/ecapa_proto4b_stream.npz --domain both --write

stage eval4b python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto4b_stream.npz

# 4. shipped-stack held-out refresh: production defaults (proto_small +
#    mc VAD + auto-enhance) across ALL domains — the first all-domain chip
#    run since the GTCRN enhance-path compile fix.
stage eval_shipped python scripts/eval_heldout.py

# 5. full bench refresh — corpus re-measure after the default_device
#    jit-cache fix (expect aggregate ~460-490x vs the 188x artifact).
stage bench python bench.py

echo "[chipq2] queue complete $(date -u)"
