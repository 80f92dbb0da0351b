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


def probe_encoder(wavs):
    import jax.numpy as jnp

    w = np.asarray(wavs)
    spec = np.abs(np.fft.rfft(w, axis=1))
    bands = np.array_split(np.arange(spec.shape[1]), 16)
    feats = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
    return jnp.asarray(feats.astype(np.float32))


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

    from speech_diarization_tpu.config import (
        AudioConfig, ClusterConfig, DiarizationConfig,
    )
    from speech_diarization_tpu.metrics import (
        diarization_error_rate, jaccard_error_rate,
    )
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.types import SegmentArray

    sr = 16000
    rng = np.random.default_rng(0)

    def make_file(seed):
        g = np.random.default_rng(seed)
        freqs = [180.0, 850.0, 2400.0, 420.0][: args.speakers]
        parts, starts, ends, spks = [], [], [], []
        t0 = 0.0
        for i in range(args.turns):
            spk = int(g.integers(0, args.speakers))
            gap = g.uniform(0.4, 0.8)
            parts.append(np.zeros(int(gap * sr), np.float32))
            t0 += gap
            dur = g.uniform(2.0, 4.0)
            t = np.arange(int(dur * sr)) / sr
            sig = 0.3 * np.sin(2 * np.pi * freqs[spk] * t) * (
                1 + 0.2 * np.sin(2 * np.pi * 2.3 * t))
            parts.append((sig + 0.01 * g.standard_normal(len(t))).astype(np.float32))
            starts.append(t0)
            ends.append(t0 + dur)
            spks.append(spk)
            t0 += dur
        parts.append(np.zeros(int(0.5 * sr), np.float32))
        return np.concatenate(parts), SegmentArray(
            np.array(starts), np.array(ends), np.array(spks, dtype=np.int32))

    files = [make_file(i) for i in range(args.n_files)]

    print(f"{'method':<10} {'DER%':>7} {'miss%':>7} {'fa%':>7} {'conf%':>7} {'JER%':>7}")
    for method in ["spectral", "ahc", "hdbscan2"]:
        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method=method, max_speakers=6),
        )
        pipe = DiarizationPipeline(cfg, encode_fn=probe_encoder)
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
