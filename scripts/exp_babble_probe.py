#!/usr/bin/env python
"""Calibrate the babble-vs-stationary auto-route statistic (VERDICT r3 #5).

Measures, per held-out domain, the two statistics the pipeline's enhance
auto-gate computes on 50 ms frames:

  * SNR estimate: 10*log10(p95/p05) of frame energies  (the existing gate)
  * floor hf-frac: fraction of the lowest-energy-decile frames' mean power
    spectrum above 4 kHz                               (the router)

The router only ever sees files the SNR gate already flagged noisy
(< 25 dB), so it needs to separate babble5/15 (route -> demix-dialog
separation, speech-shaped floor -> small hf-frac) from white10 (keep GTCRN
denoise, flat floor -> ~0.5).  A frame-energy-modulation statistic was
tried first and REJECTED (2026-08-20): below-median frame-energy spread
measured babble5 4.4-4.8 dB < white10 6.1-6.6 dB — at low SNR the
quiet-speech frames dominate the spread in both domains.  Pure numpy.

    python scripts/exp_babble_probe.py [--n-files 3] [--dur 60]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FRAME = 800  # 50 ms @ 16 kHz — must match DiarizationPipeline._SNR_FRAME

DOMAINS = (
    "indomain", "heldout-dry", "heldout-reverb3", "heldout-reverb6",
    "heldout-babble15", "heldout-babble5", "heldout-white10",
    "heldout-overlap",
)


def frame_stats(x: np.ndarray) -> tuple[float, float]:
    """(snr_db, floor_hf_frac) — numpy mirror of the device probe."""
    t = (x.shape[-1] // FRAME) * FRAME
    fr = x[:t].reshape(-1, FRAME)
    e = np.mean(np.square(fr), axis=1)
    p05, p95 = np.percentile(e, [5.0, 95.0])
    snr = 10.0 * np.log10(max(p95, 1e-30) / max(p05, 1e-12 * p95 + 1e-30))
    floor = e <= np.percentile(e, 10.0)
    ps = np.sum(np.square(np.abs(np.fft.rfft(fr, axis=1)))
                * floor[:, None], axis=0)
    hf = float(np.sum(ps[FRAME // 4:]) / (np.sum(ps) + 1e-30))
    return float(snr), hf if np.isfinite(hf) and hf > 0.0 else 1.0


def make_file(domain: str, seed: int, dur_s: float, sr: int = 16000):
    rng = np.random.default_rng(1000 + seed)
    if domain == "indomain":
        from speech_diarization_tpu.train.synthetic import make_conversation

        return make_conversation(rng, dur_s, n_speakers=3, sr=sr)[0]
    from speech_diarization_tpu.train.heldout import make_conversation_heldout

    kw = {}
    if domain == "heldout-reverb3":
        kw["rt60_s"] = 0.3
    elif domain == "heldout-reverb6":
        kw["rt60_s"] = 0.6
    elif domain == "heldout-babble15":
        kw.update(snr_db=15.0, noise_kind="babble")
    elif domain == "heldout-babble5":
        kw.update(snr_db=5.0, noise_kind="babble")
    elif domain == "heldout-white10":
        kw.update(snr_db=10.0, noise_kind="white")
    elif domain == "heldout-overlap":
        kw["overlap_frac"] = 0.3
    return make_conversation_heldout(rng, dur_s, n_speakers=3, sr=sr, **kw)[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    args = ap.parse_args()

    out = {}
    for domain in DOMAINS:
        snrs, hfs = [], []
        for i in range(args.n_files):
            x = np.asarray(make_file(domain, i, args.dur), np.float32)
            snr, hf = frame_stats(x)
            snrs.append(snr)
            hfs.append(hf)
        out[domain] = {"snr_db": [round(v, 1) for v in snrs],
                       "floor_hf_frac": [round(v, 4) for v in hfs]}
        gated = [s < 25.0 for s in snrs]
        print(f"{domain:20s} snr {np.round(snrs, 1)} "
              f"hf-frac {np.round(hfs, 4)} gate-engages {gated}")
    print(json.dumps({"metric": "babble_probe", "domains": out}))


if __name__ == "__main__":
    main()
