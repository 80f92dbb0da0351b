#!/usr/bin/env python
"""Segmentation-engine quality evaluation (VERDICT r1 #7 measurement).

Two layers:

1. **Frame level** — best-permutation frame accuracy of the PyanNet-class
   chunk-local activity model on held-out batches from BOTH generators
   (train/synthetic in-domain chunks and train/multicond mixed-family
   channel-augmented chunks), with the overlapped-frame accuracy broken out
   (frames where >=2 slots are truly active are exactly what a VAD+SCD
   chain cannot represent — reference scaffold:
   ``diarization_baseline.py:170-181``).
2. **Pipeline level** — overlap-aware DER (collar 0.25 s, overlap regions
   SCORED, not skipped) of the segmentation engine
   (pipelines/segmentation.segmentation_diarize) on held-out overlapping
   conversations, next to the flagship VAD+SCD pipeline on the same files
   (the flagship cannot emit overlapping segments, so its DER floor on
   these files is the overlapped fraction).

    python scripts/eval_segmentation.py --cpu
    python scripts/eval_segmentation.py --weights weights/segmentation_mc.npz

Prints one JSON summary line at the end.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def frame_eval(weights: Path, n_batches: int, batch: int, seed: int):
    """Best-perm frame acc (total + overlapped frames) per generator."""
    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.train.multicond import (
        make_segmentation_example_conv,
        make_segmentation_example_mc,
    )
    from speech_diarization_tpu.train.recipes import load_segmentation
    from speech_diarization_tpu.train.synthetic import make_segmentation_example

    model, params = load_segmentation(weights)
    # the head's NATIVE decode: powerset argmax (one calibrated joint
    # decision/frame) — marginal-threshold decoding under-read the xf
    # checkpoint by 5.6 pts best-perm (0.856 vs 0.912, 2026-08-20)
    act_fn = jax.jit(lambda w: model.hard_activities(params, w))

    out = {}
    for name, ex_fn in (("indomain", make_segmentation_example),
                        ("multicond", make_segmentation_example_mc),
                        ("conversation", make_segmentation_example_conv)):
        rng = np.random.default_rng(seed)
        accs, ov_accs, ov_frac = [], [], []
        for _ in range(n_batches):
            ws, ls = zip(*(ex_fn(rng) for _ in range(batch)))
            wavs, labels = np.stack(ws), np.stack(ls)
            act = np.asarray(act_fn(jnp.asarray(wavs)))
            n = min(act.shape[1], labels.shape[1])
            act, labels = act[:, :n], labels[:, :n]
            # permutation chosen PER CHUNK (models/segmentation.
            # best_permutation_accuracy semantics): slot identity is only
            # meaningful within one chunk under PIT training — a single
            # batch-global permutation (the pre-r5 behavior of this script)
            # punished chunks whose arbitrary slot order disagreed with the
            # majority and under-read every checkpoint by 4-6 pts (measured
            # 0.856 global vs 0.908 per-chunk on segmentation_xf).  The
            # overlap accuracy rides each chunk's own best permutation.
            import itertools

            ov = (labels > 0.5).sum(-1) >= 2  # >=2 slots truly active [B, T]
            ov_frac.append(float(ov.mean()))
            k = act.shape[-1]
            perms = list(itertools.permutations(range(k)))
            per_ex = np.stack([
                ((act[..., list(p)] > 0.5) == (labels > 0.5)).mean(axis=(1, 2))
                for p in perms
            ])  # [K!, B]
            best_ex = per_ex.argmax(axis=0)  # best perm index per chunk
            ex_accs, ex_ov = [], []
            for b_i, p_i in enumerate(best_ex):
                ok = ((act[b_i][:, list(perms[p_i])] > 0.5)
                      == (labels[b_i] > 0.5))
                ex_accs.append(float(ok.mean()))
                if ov[b_i].any():
                    ex_ov.append(float(ok[ov[b_i]].mean()))
            accs.append(float(np.mean(ex_accs)))
            if ex_ov:
                ov_accs.append(float(np.mean(ex_ov)))
        out[name] = {
            "best_perm_acc": round(float(np.mean(accs)), 4),
            "overlap_frame_acc": round(float(np.mean(ov_accs)), 4) if ov_accs else None,
            "overlap_frame_frac": round(float(np.mean(ov_frac)), 4),
        }
        print(f"frame[{name}]: best-perm acc {out[name]['best_perm_acc']:.4f} "
              f"(overlapped frames {out[name]['overlap_frame_acc']}, "
              f"{100 * out[name]['overlap_frame_frac']:.1f}% of frames)")
    return out


def pipeline_eval(weights: Path, n_files: int, dur_s: float, n_speakers: int,
                  overlap_frac: float, seed: int, cpu: bool,
                  aggregate: bool | None = None):
    """Overlap-aware DER: segmentation engine vs flagship on held-out
    overlapping conversations."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.metrics import diarization_error_rate
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.pipelines.segmentation import (
        SegmentationConfig, segmentation_diarize,
    )
    from speech_diarization_tpu.train.heldout import make_conversation_heldout
    from speech_diarization_tpu.train.recipes import (
        load_segmentation, load_speaker_encoder,
    )
    from speech_diarization_tpu.types import SegmentArray

    sr = 16000
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    enc_w = prefer_weights(ENCODER_PREFERENCE)
    dtype = jnp.float32 if cpu else jnp.bfloat16
    model, params = load_speaker_encoder(enc_w, dtype=dtype)
    pipe = DiarizationPipeline(
        DiarizationConfig(cluster=ClusterConfig(method="spectral", max_speakers=8)),
        encoder=(model, params))

    seg_model, seg_params = load_segmentation(weights)
    from speech_diarization_tpu.pipelines.segmentation import (
        make_seg_activities_fn,
    )

    seg_fn = make_seg_activities_fn(seg_model, seg_params)
    seg_cfg = SegmentationConfig()
    if aggregate is not None:
        seg_cfg.aggregate = aggregate

    rows = []
    for i in range(n_files):
        rng = np.random.default_rng(4000 + seed + i)
        wave, (s, e, k) = make_conversation_heldout(
            rng, dur_s, n_speakers=n_speakers, sr=sr, overlap_frac=overlap_frac)
        truth = SegmentArray(s, e, k)
        t0 = time.time()
        seg_hyp = segmentation_diarize(wave, sr, seg_fn, pipe.encode_fn, seg_cfg)
        t_seg = time.time() - t0
        t0 = time.time()
        flag_hyp = pipe((wave, sr)).segments
        t_flag = time.time() - t0
        d_seg = diarization_error_rate(truth, seg_hyp, collar_s=0.25)
        d_flag = diarization_error_rate(truth, flag_hyp, collar_s=0.25)
        rows.append((d_seg, d_flag))
        print(f"  [f{i}] seg-engine der {100 * d_seg.der:.2f}% "
              f"(miss {100 * d_seg.miss:.1f} fa {100 * d_seg.false_alarm:.1f} "
              f"conf {100 * d_seg.confusion:.1f}, {t_seg:.1f}s) | "
              f"flagship der {100 * d_flag.der:.2f}% "
              f"(miss {100 * d_flag.miss:.1f}, {t_flag:.1f}s)",
              file=sys.stderr)
    out = {}
    for name, idx in (("seg_engine", 0), ("flagship", 1)):
        ders = [r[idx] for r in rows]
        out[name] = {
            "der_pct": round(float(np.mean([d.der for d in ders]) * 100), 2),
            "miss_pct": round(float(np.mean([d.miss for d in ders]) * 100), 2),
            "fa_pct": round(float(np.mean([d.false_alarm for d in ders]) * 100), 2),
            "conf_pct": round(float(np.mean([d.confusion for d in ders]) * 100), 2),
        }
        print(f"pipeline[{name}]: DER {out[name]['der_pct']:.2f}% "
              f"(miss {out[name]['miss_pct']:.2f} fa {out[name]['fa_pct']:.2f} "
              f"conf {out[name]['conf_pct']:.2f})")
    return out


# THE canonical evaluation protocol (VERDICT r4 #7: cross-round engine
# numbers were unjudgeable because each round quoted a different generator
# mix).  Every number quoted in weights/README.md or STATUS.md MUST carry
# this tag and be produced by `--pinned`.  The pin: frame eval reported
# PER GENERATOR FAMILY (indomain = train/synthetic chaotic mix — the r3
# series; conversation = the r4 turn-taking family; multicond = channel-
# augmented), permutation chosen PER CHUNK (local-PIT semantics, see
# frame_eval), 8 batches x 8 chunks, seed 0; pipeline eval 3 x 60 s
# 3-speaker overlap-0.3 conversations, seed 0, scored with aggregation
# BOTH off and on.  Bump the version when anything here changes.
PINNED_PROTOCOL = "seg-eval-v1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=str,
                    default=str(Path(__file__).resolve().parents[1]
                                / "weights" / "segmentation_synthetic.npz"))
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-files", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--speakers", type=int, default=3)
    ap.add_argument("--overlap", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames-only", action="store_true")
    ap.add_argument("--aggregate", choices=["on", "off"], default=None,
                    help="override SegmentationConfig.aggregate for the "
                         "pipeline eval (default: config default)")
    ap.add_argument("--pinned", action="store_true",
                    help=f"run the canonical '{PINNED_PROTOCOL}' protocol: "
                         "default frame/pipeline shapes, seed 0, pipeline "
                         "scored with aggregation off AND on")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    w = Path(args.weights)
    if args.pinned:
        frame = frame_eval(w, 8, 8, 0)
        out = {"metric": "segmentation_quality", "protocol": PINNED_PROTOCOL,
               "weights": w.name, "frame": frame}
        if not args.frames_only:
            for mode, agg in (("pipeline_center_trim", False),
                              ("pipeline_aggregate", True)):
                print(f"--- pipeline eval (aggregate={agg}) ---",
                      file=sys.stderr)
                out[mode] = pipeline_eval(w, 3, 60.0, 3, 0.3, 0, args.cpu,
                                          aggregate=agg)
        print(json.dumps(out))
        return
    frame = frame_eval(w, args.n_batches, args.batch, args.seed)
    pipe = None
    if not args.frames_only:
        agg = None if args.aggregate is None else (args.aggregate == "on")
        pipe = pipeline_eval(w, args.n_files, args.dur, args.speakers,
                             args.overlap, args.seed, args.cpu, aggregate=agg)
    print(json.dumps({"metric": "segmentation_quality",
                      "weights": w.name, "frame": frame, "pipeline": pipe}))


if __name__ == "__main__":
    main()
