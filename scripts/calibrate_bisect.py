#!/usr/bin/env python
"""Calibrate the window-driven bisection statistic against a given encoder.

The split rule in ``cluster/spectral.refine_labels_by_windows`` compares the
bisected sub-centroid cosine to an ABSOLUTE threshold calibrated on the r1
encoder's cosine scale (singles >= 0.72, merged pairs <= 0.65).  A different
encoder moves the whole scale (round-2 measurement: the multi-condition
encoder's within-speaker window cosine dropped ~0.77 -> ~0.60 and the 0.65
threshold shredded single speakers into 6).  This script measures, for an
encoder and a synthesis domain, the bisection statistics of TRUE-single vs
TRUE-merged clusters so the threshold (or a scale-free variant) can be set
from evidence.

  python scripts/calibrate_bisect.py --enc weights/X.npz --domain indomain
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", default="weights/ecapa_synthetic_full_stream.npz")
    ap.add_argument("--vad", default=None)
    ap.add_argument("--domain", choices=["indomain", "heldout", "both"],
                    default="indomain")
    ap.add_argument("--dur", type=float, default=120.0)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--write", action="store_true",
                    help="stamp the decided refine_sub_cos into the "
                         "checkpoint's __meta__ (-1 = refine off)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from speech_diarization_tpu.cluster.spectral import bisect_windows
    from speech_diarization_tpu.config import (
        ClusterConfig, DiarizationConfig,
    )
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.recipes import load_speaker_encoder, load_vad
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)
    model, params = load_speaker_encoder(args.enc)
    kw = {}
    if args.vad:
        from functools import partial

        vad, vp = load_vad(args.vad)
        kw["vad_probs_fn"] = jax.jit(partial(vad.probs, vp))

    cfg = DiarizationConfig(cluster=ClusterConfig(
        method="spectral", max_speakers=8, refine_splits=False))
    pipe = DiarizationPipeline(cfg, encoder=(model, params), **kw)

    def make(domain, seed, n_spk, dur):
        rng = np.random.default_rng(seed)
        if domain == "indomain":
            from speech_diarization_tpu.train.synthetic import make_conversation

            return make_conversation(rng, dur, n_speakers=n_spk, sr=16000)
        from speech_diarization_tpu.train.heldout import make_conversation_heldout

        return make_conversation_heldout(rng, dur, n_speakers=n_spk, sr=16000)

    domains = (["indomain", "heldout"] if args.domain == "both"
               else [args.domain])
    rows = []
    for domain in domains:
      for n_spk in (1, 2, 3):
        for i in range(args.files):
            wave, (ts, te, tk) = make(domain, 500 + 10 * n_spk + i,
                                      n_spk, args.dur)
            res = pipe((wave, 16000), collect_diagnostics=True)
            d = res.diagnostics
            wemb = np.asarray(d["window_embeddings"], np.float64)
            wstart = np.asarray(d["window_starts_s"])
            labels = np.asarray(d["labels"])
            segs = res.segments  # post-merge; approximate alignment is fine
            starts, ends = np.asarray(segs.starts), np.asarray(segs.ends)
            spks = np.asarray(segs.spks)
            if len(wemb) == 0 or len(starts) == 0:
                continue
            e = wemb / (np.linalg.norm(wemb, axis=1, keepdims=True) + 1e-9)
            # fully-inside window -> segment
            order = np.argsort(starts)
            pos = np.searchsorted(starts[order], wstart, side="right") - 1
            cand = order[np.clip(pos, 0, None)]
            inside = (pos >= 0) & (wstart + 1.0 <= ends[cand] + 1e-9)
            # truth speaker of each segment by midpoint lookup
            mid = (starts + ends) / 2
            tpos = np.searchsorted(ts, mid, side="right") - 1
            tspk = tk[np.clip(tpos, 0, None)]
            # truth speaker per WINDOW (center-sample lookup — finer than the
            # member-segment midpoint, so cluster composition is by time
            # actually covered by the windows the bisection sees)
            wmid = wstart + 0.5
            wpos = np.searchsorted(ts, wmid, side="right") - 1
            wspk = tk[np.clip(wpos, 0, None)]
            for c in np.unique(spks[spks >= 0]):
                member = np.where(spks == c)[0]
                wmask = inside & np.isin(cand, member)
                if wmask.sum() < 100:
                    continue
                we = e[wmask]
                sub_cos, side = bisect_windows(we)
                cent = we.mean(0)
                cent /= np.linalg.norm(cent) + 1e-9
                within = float((we @ cent).mean())
                comp = np.bincount(
                    np.searchsorted(np.unique(wspk[wmask]), wspk[wmask]))
                maj_frac = float(comp.max() / comp.sum())
                # merged = the minority truth speaker holds >=20% of the
                # cluster's windows; below that it's labeling noise, not a
                # collapsed pair the bisection should split
                rows.append({
                    "domain": domain,
                    "n_spk": n_spk, "file": i, "cluster": int(c),
                    "windows": int(wmask.sum()),
                    "sub_cos": round(float(sub_cos), 4),
                    "within_cos": round(within, 4),
                    "rel": round(float(sub_cos) / (within + 1e-9), 4),
                    "maj_frac": round(maj_frac, 3),
                    "merged": bool(maj_frac <= 0.8),
                })
    for r in rows:
        print(json.dumps(r))
    merged = [r for r in rows if r["merged"]]
    single = [r for r in rows if not r["merged"]]
    if merged and single:
        print(json.dumps({
            "single_sub_cos_min": min(r["sub_cos"] for r in single),
            "merged_sub_cos_max": max(r["sub_cos"] for r in merged),
            "single_rel_min": min(r["rel"] for r in single),
            "merged_rel_max": max(r["rel"] for r in merged),
        }))

    if args.write:
        # decide the encoder's refine_sub_cos and stamp it into the npz meta
        # (the pipeline reads it; absent meta falls back to the r1-calibrated
        # 0.65, which over-splits encoders with a lower cosine scale).
        # Split fires when sub_cos <= thr, so:
        #   * merged+single separable -> midpoint of the gap
        #   * singles only            -> just below every observed single
        #     (provably never splits what we saw)
        #   * inseparable or no data  -> -1.0 = refine off for these weights
        thr = -1.0
        if single:
            smin = min(r["sub_cos"] for r in single)
            if merged:
                mmax = max(r["sub_cos"] for r in merged)
                if mmax < smin - 0.02:
                    thr = round((mmax + smin) / 2.0, 4)
            else:
                thr = round(max(smin - 0.05, 0.0), 4)
        from speech_diarization_tpu.models.port import update_params_meta

        update_params_meta(args.enc, refine_sub_cos=thr)
        print(json.dumps({"written": args.enc, "refine_sub_cos": thr,
                          "n_single": len(single), "n_merged": len(merged)}))


if __name__ == "__main__":
    main()
