#!/bin/bash
# Third serialized TPU-chip queue: demix quality push (VERDICT r1 #8).
# Waits for chip_queue2 to finish, then continues the +7.11 dB/stem chip
# checkpoint at a decayed LR toward the >= +8 dB ship bar (Demucs-grade
# target >= +10 dB).
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq3_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq3] skip ${name} (done)"; return 0
  fi
  echo "[chipq3] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "/tmp/chipq3_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq3] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq3] FAILED ${name} rc=$? — continuing"
  fi
}

if [ -f /tmp/chipq2.pid ]; then
  pid="$(cat /tmp/chipq2.pid)"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 120
  done
fi
echo "[chipq3] chip free — starting $(date -u)"

stage demix_cont python scripts/train_mc.py demix --steps 8000 --lr 3e-4 \
  --src weights/demix_mc.npz --out weights/demix_mc.npz

echo "[chipq3] queue complete $(date -u)"
