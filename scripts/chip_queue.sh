#!/bin/bash
# Serialized TPU-chip work queue (round 2 agenda, STATUS.md "chip work
# queue").  One stage = one fresh process (a failed axon compile poisons its
# process — isolation keeps the queue alive); stages run strictly
# sequentially (two concurrent chip processes corrupt numerics SILENTLY).
#
# Idempotent: each stage writes /tmp/chipq_done_<name> on success and is
# skipped on re-run.  Logs: /tmp/chipq_<name>.log.
#
# Launch ONLY when the tunnel is up and NO other TPU process is running.
set -u
cd "$(dirname "$0")/.."
export SDTPU_LOG_LEVEL=INFO

stage() {
  local name="$1"; shift
  local marker="/tmp/chipq_done_${name}"
  if [ -f "$marker" ]; then
    echo "[chipq] skip ${name} (done)"; return 0
  fi
  echo "[chipq] start ${name}: $* ($(date -u +%H:%M:%S))"
  if timeout 7200 "$@" > "/tmp/chipq_${name}.log" 2>&1; then
    touch "$marker"
    echo "[chipq] done ${name} ($(date -u +%H:%M:%S))"
  else
    echo "[chipq] FAILED ${name} rc=$? — continuing"
  fi
}

# 0. stop the CPU-bound gtcrn fallback run, if still alive: the chip does
#    the same 1500 steps in minutes (stage 2) and the freed core unblocks
#    the tunnel client (CPU contention inflates dispatch ~8x).
for pidf in /tmp/train_gtcrn.pid /tmp/train_seg.pid /tmp/train_demix.pid \
            /tmp/train_proto_small.pid; do
  if [ -f "$pidf" ] && kill -0 "$(cat "$pidf")" 2>/dev/null; then
    kill "$(cat "$pidf")"
    echo "[chipq] stopped CPU fallback run $pidf ($(cat "$pidf"))"
    sleep 2
  fi
done

# 1. proto3 encoder: the fixed-crest-factor multi-condition retrain
#    (competing speech 0.3, channel 0.7, snr floor 5 dB) — the encoder is
#    the sole remaining accuracy axis on held-out domains (STATUS.md).
#    COLD start: the 128-ch CPU validation run (ecapa_proto_small, cold,
#    2500 steps) crushed both warm-started full-size encoders on every
#    held-out domain (dry 1.5% vs 44-54%) — warm-starting from proto2
#    anchors to broken-crest features.
stage proto3 python scripts/train_mc.py encoder-proto --cold --full-size \
  --steps 4000 --spk-batch 16 --competing-p 0.3 --channel-p 0.7 \
  --snr-floor 5 --out weights/ecapa_proto3_stream.npz

# 2. gtcrn multi-condition retrain on chip (babble beds; supersedes the
#    1-core CPU run).
stage gtcrn python scripts/train_mc.py gtcrn --steps 1500 \
  --out weights/gtcrn_mc.npz

# 2.5 calibrate the bisect-refine threshold for proto3 and stamp it into
#     the npz meta (absent meta falls back to the r1 0.65, which over-splits
#     proto-family encoders — ADVICE r1 / STATUS decomposition #3).
stage calib_proto3 python scripts/calibrate_bisect.py \
  --enc weights/ecapa_proto3_stream.npz --domain both --write

# 3. held-out re-baseline: proto3 across all domains, raw.
stage eval_proto3 python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto3_stream.npz

# 4. held-out noise domains with the GTCRN-for-VAD front end (E4 showed it
#    collapses the white10 VAD failure; now with the mc enhancer).
stage eval_proto3_envad env SDTPU_EVAL_ENHANCE=gtcrn SDTPU_EVAL_ENHANCE_SCOPE=vad \
  python scripts/eval_heldout.py \
  --enc-weights weights/ecapa_proto3_stream.npz \
  --domains heldout-babble15,heldout-babble5,heldout-white10

# 5. powerset segmentation head training (pyannote-3.x formulation) —
#    warm-started from the CPU 1500-step checkpoint if present.
stage seg_powerset python scripts/train_mc.py segmentation --powerset \
  --steps 4000 --src weights/segmentation_powerset.npz \
  --out weights/segmentation_powerset.npz

# 6. segmentation quality eval (frame + overlap-aware pipeline DER).
stage eval_seg python scripts/eval_segmentation.py \
  --weights weights/segmentation_powerset.npz

# 6.5 zipenhancer multi-condition retrain (babble beds; cheap on chip).
stage zipenhancer python scripts/train_mc.py zipenhancer --steps 600 \
  --out weights/zipenhancer_mc.npz

# 7. scaled demixer retrain on chip (SIGILL root cause fixed = boot-id
#    cache keying; if the backward still dies this log is the evidence).
#    The CPU fallback run reached +4.56 dB in 800 steps (vs r1's +3.6 from
#    a 9x smaller net); the 29M-param net is undertrained — give it 3000
#    chip steps.  NOTE: demix_mc.npz is gitignored (117 MB) until quality
#    justifies shipping (f16 + ship when >= +8 dB).
stage demix python scripts/train_mc.py demix --steps 3000 \
  --out weights/demix_mc.npz

# 8. full bench refresh (RTF + DER + corpus + MFU + fbank) — last, so the
#    artifact reflects the final shipped weights.
stage bench python bench.py

echo "[chipq] queue complete $(date -u)"
