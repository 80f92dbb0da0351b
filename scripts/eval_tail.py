#!/usr/bin/env python
"""In-domain heavy-tail probe: per-seed 60 s 3-speaker DER for an encoder.

Seeds 2000-2005 are the documented heavy tail (near-collided speaker
profiles); the regression gate pins their median/mean.  Use this to
compare encoder candidates on exactly the gate's distribution before
re-pinning.

    python scripts/eval_tail.py --enc weights/ecapa_robust_stream.npz
"""
from __future__ import annotations

import argparse
import json
import sys
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", default=None)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=list(range(2000, 2006)))
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--cpu", action="store_true")
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
    enc_w = args.enc or prefer_weights(ENCODER_PREFERENCE)
    model, params = load_speaker_encoder(enc_w)
    vad, vp = load_vad(prefer_weights(("vad_conv_mc.npz",
                                       "vad_conv_synthetic.npz")))
    pipe = DiarizationPipeline(
        DiarizationConfig(cluster=ClusterConfig(method="spectral",
                                                max_speakers=8)),
        encoder=(model, params),
        vad_probs_fn=jax.jit(partial(vad.probs, vp)))

    rows = []
    for seed in args.seeds:
        wave, (s, e, k) = make_conversation(
            np.random.default_rng(seed), args.dur, n_speakers=3, sr=16000)
        res = pipe((np.asarray(wave, np.float32), 16000))
        d = diarization_error_rate(SegmentArray(s, e, k), res.segments,
                                   collar_s=0.25)
        rows.append({"seed": seed, "spk": res.num_speakers,
                     "der_pct": round(d.der * 100, 2),
                     "conf_pct": round(d.confusion * 100, 2)})
        print(rows[-1])
    ders = [r["der_pct"] for r in rows]
    print(json.dumps({"metric": "indomain_tail", "enc": str(enc_w),
                      "median_pct": round(float(np.median(ders)), 2),
                      "mean_pct": round(float(np.mean(ders)), 2)}))


if __name__ == "__main__":
    main()
