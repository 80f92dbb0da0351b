#!/usr/bin/env python
"""Synthetic DER/JER evaluation harness: runs the flagship pipeline across
clustering backends on generated multi-speaker conversations and prints a
metric table.  CPU-runnable (no checkpoints needed — the trained synthetic
VAD + the spectral-signature probe encoder exercise the full stack).

    python scripts/eval_synthetic.py [--n-files 5] [--turns 8]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=4)
    ap.add_argument("--turns", type=int, default=8)
    ap.add_argument("--speakers", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from speech_diarization_tpu.config import (
        AudioConfig, ClusterConfig, DiarizationConfig,
    )
    from speech_diarization_tpu.metrics import (
        diarization_error_rate, jaccard_error_rate,
    )
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.synthetic import (
        make_tone_conversation, spectral_probe_encoder,
    )
    from speech_diarization_tpu.types import SegmentArray

    sr = 16000

    def encode(wavs):
        return jnp.asarray(spectral_probe_encoder(wavs))

    files = []
    for i in range(args.n_files):
        wave, (starts, ends, spks) = make_tone_conversation(
            i, n_speakers=args.speakers, turns=args.turns, sr=sr
        )
        files.append((wave, SegmentArray(starts, ends, spks)))

    print(f"{'method':<10} {'DER%':>7} {'miss%':>7} {'fa%':>7} {'conf%':>7} {'JER%':>7}")
    for method in ["spectral", "ahc", "hdbscan", "hdbscan2"]:
        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method=method, max_speakers=6),
        )
        pipe = DiarizationPipeline(cfg, encode_fn=encode)
        ders, jers = [], []
        for wave, truth in files:
            res = pipe((wave, sr))
            d = diarization_error_rate(truth, res.segments, collar_s=0.25)
            ders.append(d)
            jers.append(jaccard_error_rate(truth, res.segments, collar_s=0.25))
        der = np.mean([d.der for d in ders]) * 100
        miss = np.mean([d.miss for d in ders]) * 100
        fa = np.mean([d.false_alarm for d in ders]) * 100
        conf = np.mean([d.confusion for d in ders]) * 100
        jer = np.mean(jers) * 100
        print(f"{method:<10} {der:>7.2f} {miss:>7.2f} {fa:>7.2f} {conf:>7.2f} {jer:>7.2f}")


if __name__ == "__main__":
    main()
