#!/usr/bin/env python
"""Reproduce the bench 600 s seed-0 case off-chip: per-stage DER with the
production pipeline, plus an offline clustering A/B (sharpened vs binarized)
on the pipeline's own segment embeddings.

Context (2026-08-19): the chip bench read 10.09% DER @600 s with the
sharpened weighted affinity (was 0.55% under the old binarized candidates),
k=3 correct both times -> membership confusion somewhere.  This script
answers whether the regression is the clustering itself (reproduces in f32
on CPU) or a bf16/chip interaction.
"""
from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=600.0)
    ap.add_argument("--seed", type=int, default=0)
    # BooleanOptionalAction so --no-cpu runs the chip arm of the bf16/chip
    # comparison (ADVICE r2: store_true+default=True could never run on chip)
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction, default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.metrics import diarization_error_rate
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.recipes import (
        load_speaker_encoder, load_vad,
    )
    from speech_diarization_tpu.train.synthetic import make_conversation
    from speech_diarization_tpu.types import SegmentArray
    from speech_diarization_tpu.utils.cache import setup_compilation_cache
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    setup_compilation_cache(ROOT)
    wave, (s, e, k) = make_conversation(
        np.random.default_rng(args.seed), args.dur, n_speakers=3, sr=16000)
    truth = SegmentArray(np.asarray(s), np.asarray(e), np.asarray(k))

    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE))
    vad, vp = load_vad(prefer_weights(("vad_conv_mc.npz",
                                       "vad_conv_synthetic.npz")))
    pipe = DiarizationPipeline(
        DiarizationConfig(cluster=ClusterConfig(method="spectral",
                                                max_speakers=8)),
        encoder=(model, params),
        vad_probs_fn=jax.jit(partial(vad.probs, vp)))
    res = pipe((np.asarray(wave, np.float32), 16000))
    d = diarization_error_rate(truth, res.segments, collar_s=0.25)
    print({"stage": "pipeline-f32", "spk": res.num_speakers,
           "der_pct": round(d.der * 100, 2),
           "miss_pct": round(d.miss * 100, 2),
           "fa_pct": round(d.false_alarm * 100, 2),
           "conf_pct": round(d.confusion * 100, 2)})


if __name__ == "__main__":
    main()
