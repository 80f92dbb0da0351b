#!/usr/bin/env python
"""VAD-only held-out evaluation: frame-level miss/FA per acoustic domain.

Scores a VAD checkpoint's binarized speech mask directly against the
generator's ground-truth turns — no encoder, no clustering — so VAD
retrains (the white-noise miss axis, STATUS.md) can be judged in seconds
per domain without confounding the measurement with speaker-confusion
error the way full-pipeline DER does.

    python scripts/eval_vad.py --cpu --weights weights/vad_conv_mc3.npz
    python scripts/eval_vad.py --cpu --weights a.npz --baseline b.npz
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from eval_heldout import DOMAINS, make_file  # noqa: E402


def frame_truth(s, e, n_frames: int, hop_s: float) -> np.ndarray:
    t = (np.arange(n_frames) + 0.5) * hop_s
    mask = np.zeros(n_frames, bool)
    for a, b in zip(s, e):
        mask |= (t >= a) & (t < b)
    return mask


def score_weights(path: Path, domains, n_files: int, dur_s: float,
                  n_speakers: int, collar_frames: int = 5):
    from functools import partial

    import jax

    from speech_diarization_tpu.config import VadConfig
    from speech_diarization_tpu.pipelines.chunking import chunked_framewise
    from speech_diarization_tpu.segment.vad_post import (
        apply_energy_veto,
        vad_mask_from_probs,
    )
    from speech_diarization_tpu.train.recipes import load_vad

    vad, params = load_vad(path)
    probs_fn = jax.jit(partial(vad.probs, params))
    cfg = VadConfig()
    sr, hop_s = 16000, 0.010
    hop = int(sr * hop_s)
    out = {}
    for domain in domains:
        miss, fa = [], []
        for i in range(n_files):
            wave, (s, e, k) = make_file(domain, i, dur_s, n_speakers, sr)
            probs = np.asarray(
                chunked_framewise(probs_fn, wave, sr, frame_hop=hop))
            # production chain includes the energy-floor veto (host numpy
            # mirror of pipelines.diarize's on-device frame energy)
            nf = len(wave) // hop
            en = 10.0 * np.log10(
                np.mean(wave[: nf * hop].reshape(nf, hop) ** 2, -1) + 1e-12)
            gated = apply_energy_veto(probs, en, cfg)
            pred = np.asarray(vad_mask_from_probs(gated, cfg))
            truth = frame_truth(s, e, len(pred), hop_s)
            # ignore a collar around truth boundaries (reverb smears
            # offsets; DER uses a 0.25 s collar for the same reason)
            edges = np.flatnonzero(np.diff(truth.astype(np.int8)))
            scored = np.ones(len(pred), bool)
            for ed in edges:
                scored[max(0, ed - collar_frames): ed + collar_frames + 1] = False
            t, p = truth[scored], pred[scored]
            miss.append(float((t & ~p).sum() / max(t.sum(), 1)))
            fa.append(float((~t & p).sum() / max((~t).sum(), 1)))
        out[domain] = {"miss_pct": round(100 * float(np.mean(miss)), 2),
                       "fa_pct": round(100 * float(np.mean(fa)), 2)}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=str, required=True)
    ap.add_argument("--baseline", type=str, default=None,
                    help="second checkpoint to print side by side")
    ap.add_argument("--n-files", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--speakers", type=int, default=3)
    ap.add_argument("--domains", type=str, default=",".join(DOMAINS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    domains = args.domains.split(",")
    res = {Path(args.weights).name: score_weights(
        Path(args.weights), domains, args.n_files, args.dur, args.speakers)}
    if args.baseline:
        res[Path(args.baseline).name] = score_weights(
            Path(args.baseline), domains, args.n_files, args.dur,
            args.speakers)

    names = list(res)
    head = "".join(f" {n[:26]:>28}" for n in names)
    print(f"{'domain':<18}{head}")
    print(f"{'':<18}" + " ".join(f"{'miss%':>13} {'fa%':>14}" for _ in names))
    for d in domains:
        row = "".join(
            f" {res[n][d]['miss_pct']:>13.2f} {res[n][d]['fa_pct']:>14.2f}"
            for n in names)
        print(f"{d:<18}{row}")
    print(json.dumps({"metric": "vad_heldout", "weights": res}))


if __name__ == "__main__":
    main()
