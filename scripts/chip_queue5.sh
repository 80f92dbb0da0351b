#!/bin/bash
# Fifth serialized TPU-chip queue: robust-encoder in-domain tail fix +
# final re-measure with the sharpened clustering.
#
# The robust default wins every eval_heldout domain but the 60 s in-domain
# heavy-tail seeds show a residual trade vs r1 (2002 merge, 2003
# over-split).  proto5 = clean-lean fine-tune phase (augmentation
# annealing: low channel/competing probability, high SNR floor, small LR)
# to restore fine in-domain discrimination without losing robustness —
# both axes measured afterwards.
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq5_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq5] skip ${name} (done)"; return 0
  fi
  echo "[chipq5] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "/tmp/chipq5_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq5] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq5] FAILED ${name} rc=$? — continuing"
  fi
}

if [ -f /tmp/chipq4.pid ]; then
  pid="$(cat /tmp/chipq4.pid)"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 120
  done
fi
echo "[chipq5] chip free — starting $(date -u)"

# 1. augmentation-annealed fine-tune of the shipped robust encoder
stage proto5 python scripts/train_mc.py encoder-proto \
  --src weights/ecapa_robust_stream.npz --steps 2000 --lr 1e-4 \
  --spk-batch 16 --competing-p 0.1 --channel-p 0.3 --snr-floor 15 \
  --out weights/ecapa_proto5_stream.npz

# 2. both axes for the candidate: held-out domains + in-domain tail
stage eval5 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto5_stream.npz
stage tail5 python scripts/eval_tail.py \
  --enc weights/ecapa_proto5_stream.npz

# 3. tail under the SHIPPED robust weights on chip (bf16) for a clean
#    side-by-side (CPU f32 probe measured median 9.1 / mean 13.1)
stage tail_robust python scripts/eval_tail.py \
  --enc weights/ecapa_robust_stream.npz

# 4. held-out refresh for the shipped default WITH the sharpened
#    clustering (eval4b predates it)
stage eval_robust2 python scripts/eval_heldout.py

# 5. full bench with tonight's final stack
stage bench python bench.py

echo "[chipq5] queue complete $(date -u)"
