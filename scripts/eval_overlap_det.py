#!/usr/bin/env python
"""Overlap-DETECTOR quality probe: frame-level precision/recall of the
segmentation model's ">=2 speakers active" decision against synthesis truth.

This is the direct metric for the overlap-rescue stage (segment/overlap.py):
the rescue only consumes the binary overlap mask, so detector P/R — not
best-perm accuracy — is what decides whether the stage helps.  The r4 probe
that motivated the conversation-structured generator measured the xf
checkpoint hallucinating >=2 on 86-95% of single-speaker frames on
held-out audio; this script makes that number a tracked artifact.

    python scripts/eval_overlap_det.py [--weights W.npz] [--cpu]
        [--domains heldout-overlap,heldout-dry,indomain] [--dur 60]

Per domain: overlap-frame precision / recall (vs truth n_active>=2),
false->=2 rate on single-speaker frames, >=1 rate on silence frames, and
the overlap/speech ratio the rescue's sanity cap sees.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from eval_heldout import make_file  # noqa: E402


def truth_active_counts(s, e, k, dur_s, hop_s=0.01):
    n = int(dur_s / hop_s) + 1
    t = np.arange(n) * hop_s
    cnt = np.zeros(n, np.int32)
    for a, b in zip(s, e):
        cnt[(t >= a) & (t < b)] += 1
    return cnt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--domains", type=str,
                    default="heldout-overlap,heldout-dry,indomain")
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--n-files", type=int, default=3)
    ap.add_argument("--speakers", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from speech_diarization_tpu.pipelines.segmentation import (
        make_seg_activities_fn,
    )
    from speech_diarization_tpu.segment.overlap import detect_overlap_regions
    from speech_diarization_tpu.train.recipes import load_segmentation
    from speech_diarization_tpu.utils.weights import prefer_weights

    w = Path(args.weights) if args.weights else prefer_weights(
        ("segmentation_conv.npz", "segmentation_xf.npz",
         "segmentation_ow3.npz", "segmentation_powerset.npz"))
    if w is None:
        raise SystemExit("no segmentation weights")
    model, params = load_segmentation(w)
    seg_fn = make_seg_activities_fn(model, params)
    print(f"detector weights: {w.name}", file=sys.stderr)

    sr, hop_s = 16000, 0.01
    summary = {}
    print(f"{'domain':<18} {'prec':>6} {'rec':>6} {'f1':>6} "
          f"{'fa1spk':>7} {'fa_sil':>7} {'ov/spk':>7}")
    for domain in args.domains.split(","):
        tp = fp = fn_ = 0
        single_total = single_fa = 0
        sil_total = sil_fa = 0
        ov_s = speech_s = 0.0
        for i in range(args.n_files):
            wave, (s, e, k) = make_file(domain, i, args.dur, args.speakers, sr)
            truth = truth_active_counts(s, e, k, args.dur, hop_s)
            regions = detect_overlap_regions(np.asarray(wave, np.float32),
                                             sr, seg_fn)
            pred = np.zeros(len(truth), bool)
            for a, b in zip(regions.starts, regions.ends):
                pred[int(a / hop_s): int(b / hop_s) + 1] = True
            pred = pred[: len(truth)]
            tov = truth >= 2
            tp += int((pred & tov).sum())
            fp += int((pred & ~tov).sum())
            fn_ += int((~pred & tov).sum())
            one = truth == 1
            single_total += int(one.sum())
            single_fa += int((pred & one).sum())
            sil = truth == 0
            sil_total += int(sil.sum())
            sil_fa += int((pred & sil).sum())
            ov_s += float((regions.ends - regions.starts).sum())
            speech_s += float(np.sum(e - s))
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn_, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        fa1 = single_fa / max(single_total, 1)
        fas = sil_fa / max(sil_total, 1)
        ratio = ov_s / max(speech_s, 1e-9)
        print(f"{domain:<18} {prec:>6.3f} {rec:>6.3f} {f1:>6.3f} "
              f"{fa1:>7.3f} {fas:>7.3f} {ratio:>7.3f}")
        summary[domain] = {"precision": round(prec, 4),
                           "recall": round(rec, 4), "f1": round(f1, 4),
                           "false_ov_rate_single_spk_frames": round(fa1, 4),
                           "ov_rate_silence_frames": round(fas, 4),
                           "overlap_to_speech_ratio": round(ratio, 4)}
    print(json.dumps({"metric": "overlap_detector",
                      "weights": w.name, "domains": summary}))


if __name__ == "__main__":
    main()
