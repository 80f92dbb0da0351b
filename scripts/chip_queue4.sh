#!/bin/bash
# Fourth serialized TPU-chip queue: segmentation overlap push.
# Capacity is measured NOT the bottleneck (128/128 == 96/96 at 0.91/0.885
# per-chunk best-perm); the residual error is overlap frames (0.70 acc).
# Controlled experiments: overlap-weighted PIT-CE at two strengths plus a
# long-steps control, all from the shipped 96/96 powerset checkpoint.
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq4_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq4] skip ${name} (done)"; return 0
  fi
  echo "[chipq4] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "/tmp/chipq4_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq4] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq4] FAILED ${name} rc=$? — continuing"
  fi
}

if [ -f /tmp/chipq3.pid ]; then
  pid="$(cat /tmp/chipq3.pid)"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 120
  done
fi
echo "[chipq4] chip free — starting $(date -u)"

stage seg_ow2 python scripts/train_mc.py segmentation --powerset \
  --steps 6000 --overlap-weight 2.0 \
  --src weights/segmentation_powerset.npz \
  --out weights/segmentation_ow2.npz
stage eval_ow2 python scripts/eval_segmentation.py \
  --weights weights/segmentation_ow2.npz

stage seg_ow4 python scripts/train_mc.py segmentation --powerset \
  --steps 6000 --overlap-weight 4.0 \
  --src weights/segmentation_powerset.npz \
  --out weights/segmentation_ow4.npz
stage eval_ow4 python scripts/eval_segmentation.py \
  --weights weights/segmentation_ow4.npz

# step-budget control: same steps, no overlap weighting
stage seg_long python scripts/train_mc.py segmentation --powerset \
  --steps 6000 \
  --src weights/segmentation_powerset.npz \
  --out weights/segmentation_long.npz
stage eval_long python scripts/eval_segmentation.py \
  --weights weights/segmentation_long.npz

echo "[chipq4] queue complete $(date -u)"
