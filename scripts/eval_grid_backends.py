"""Compare the windowed vs streaming dense-grid embedding backends.

Runs the selftest-config flagship pipeline (neural VAD + shipped full-size
encoder + spectral clustering) on generated speech-like conversations and
reports DER, speaker counts, and wall time per backend.  Run on the TPU chip
(default env) or CPU (JAX_PLATFORMS=cpu).

    python scripts/eval_grid_backends.py [--files 3] [--dur 60] [--bf16]
"""
from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--backends", default="windowed,streaming")
    ap.add_argument("--weights", default=None,
                    help="encoder npz (default: shipped full-size weights)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(Path(__file__).resolve().parents[1])

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.metrics.der import diarization_error_rate
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.recipes import (
        load_speaker_encoder, load_vad,
    )
    from speech_diarization_tpu.train.synthetic import make_conversation
    from speech_diarization_tpu.types import SegmentArray

    sr = 16000
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, WEIGHTS_ROOT, prefer_weights,
    )

    wdir = WEIGHTS_ROOT
    dtype = jnp.bfloat16 if args.bf16 else None
    default_w = prefer_weights(ENCODER_PREFERENCE)
    model, params = load_speaker_encoder(
        Path(args.weights) if args.weights else default_w, dtype=dtype)
    print(f"encoder: {args.weights or default_w}", flush=True)
    vad_w = next(wdir / n for n in ("vad_conv_mc.npz", "vad_conv_synthetic.npz",
                                    "vad_synthetic.npz")
                 if (wdir / n).exists())
    vad, vad_params = load_vad(vad_w)
    vad_fn = jax.jit(partial(vad.probs, vad_params))

    print(f"device: {jax.devices()[0]}", flush=True)
    files = [make_conversation(np.random.default_rng(100 + i), args.dur,
                               n_speakers=args.speakers)
             for i in range(args.files)]

    for backend in args.backends.split(","):
        cfg = DiarizationConfig(
            cluster=ClusterConfig(method="spectral", max_speakers=8))
        cfg = replace(cfg, embed=replace(cfg.embed, grid_backend=backend))
        pipe = DiarizationPipeline(cfg, encoder=(model, params),
                                   vad_probs_fn=vad_fn)
        ders, spks, walls = [], [], []
        for j, (wave, (st, en, sp)) in enumerate(files):
            t0 = time.perf_counter()
            out = pipe((wave, sr))
            wall = time.perf_counter() - t0
            d = diarization_error_rate(SegmentArray(st, en, sp), out.segments)
            ders.append(d.der)
            spks.append(out.num_speakers)
            walls.append(wall)
            print(f"  [{backend}] file{j}: DER={d.der*100:.2f}% "
                  f"spk={out.num_speakers} wall={wall:.2f}s "
                  f"(rtf={args.dur/wall:.0f}x)", flush=True)
        print(f"{backend}: mean DER={np.mean(ders)*100:.2f}% spk={spks} "
              f"best-wall={min(walls):.2f}s rtf={args.dur/min(walls):.0f}x",
              flush=True)


if __name__ == "__main__":
    main()
