#!/usr/bin/env python
"""Segmentation-engine clustering A/B on the pinned pipeline files.

The conv8k engine's residual vs the flagship is CONFUSION (11.09 vs 6.62
on the seg-eval-v1 pipeline files): slot segments are embedded off the
shared grid and clustered globally — the engine uses threshold-AHC
(pyannote's default) while the flagship uses the sharpened-spectral
eigengap backend plus window-driven split refinement.  This probe holds
everything else fixed (conv8k detections, masked embeddings, merge) and
swaps the global clustering backend, on exactly the pinned files.

    python scripts/exp_engine_cluster.py [--weights ...] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/segmentation_conv.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hops-only", action="store_true",
                    help="only the chunk-hop variants (quick follow-up)")
    ap.add_argument("--alt-seeds", action="store_true",
                    help="held-out validation draw (7100+) instead of the "
                         "pinned 4000+ files")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.metrics import diarization_error_rate
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.pipelines.segmentation import (
        SegmentationConfig, make_seg_activities_fn, segmentation_diarize,
    )
    from speech_diarization_tpu.train.heldout import make_conversation_heldout
    from speech_diarization_tpu.train.recipes import (
        load_segmentation, load_speaker_encoder,
    )
    from speech_diarization_tpu.types import SegmentArray
    from speech_diarization_tpu.utils.cache import setup_compilation_cache
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    setup_compilation_cache(ROOT)
    sr = 16000
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE),
                                         dtype=dtype)
    pipe = DiarizationPipeline(
        DiarizationConfig(cluster=ClusterConfig(method="spectral",
                                                max_speakers=8)),
        encoder=(model, params))
    seg_model, seg_params = load_segmentation(args.weights)
    seg_fn = make_seg_activities_fn(seg_model, seg_params)

    variants = {} if args.hops_only else {
        "ahc0.70": SegmentationConfig(cluster_method="ahc"),
        "ahc0.60": SegmentationConfig(cluster_method="ahc",
                                      cos_threshold=0.60),
        "spectral": SegmentationConfig(),   # shipped default (r5)
        # miss levers on the spectral default (engine miss 7.11 dominates)
        "spec_minon.15": SegmentationConfig(min_on_s=0.15),
        "spec_minoff.2": SegmentationConfig(min_off_s=0.20),
        "spec_hop1.25": SegmentationConfig(chunk_hop_s=1.25),
        "spec_hop0.625": SegmentationConfig(chunk_hop_s=0.625),
    }
    if args.hops_only:
        variants = {
            "spec_hop1.25": SegmentationConfig(chunk_hop_s=1.25),
            "spec_hop0.625": SegmentationConfig(chunk_hop_s=0.625),
        }
    files = []
    seeds = ([4000 + i for i in range(3)] if not args.alt_seeds
             else [7100 + i for i in range(3)])
    for sd in seeds:
        rng = np.random.default_rng(sd)
        wave, (s, e, k) = make_conversation_heldout(
            rng, 60.0, n_speakers=3, sr=sr, overlap_frac=0.3)
        files.append((wave, SegmentArray(s, e, k)))

    for name, cfg in variants.items():
        ders = []
        for wave, truth in files:
            hyp = segmentation_diarize(wave, sr, seg_fn, pipe.encode_fn, cfg)
            ders.append(diarization_error_rate(truth, hyp, collar_s=0.25))
        print(f"{name}: DER {100*np.mean([d.der for d in ders]):.2f}% "
              f"(miss {100*np.mean([d.miss for d in ders]):.2f} "
              f"fa {100*np.mean([d.false_alarm for d in ders]):.2f} "
              f"conf {100*np.mean([d.confusion for d in ders]):.2f})",
              flush=True)


if __name__ == "__main__":
    main()
