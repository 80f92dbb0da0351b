#!/usr/bin/env python
"""Decompose the streaming-chunk fbank wall (bench_trunk.py read it at
~1.68 ms of the 2.53 ms trunk — 30x above a naive roofline; neither the
bf16-operand DFT nor the fused Pallas kernel moved it, so the matmuls are
NOT the bottleneck).  Times each stage cumulatively on the production
chunk shape.

    python scripts/bench_fbank_stages.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SR = 16000


def amortized(fn, seg, iters=4, K=16, label=""):
    import jax
    import jax.numpy as jnp

    def chained(seg0):
        def body(carry, _):
            o = fn(carry)
            dep = (jnp.sum(o) * jnp.float32(1e-12)).astype(carry.dtype)
            return carry + dep, None

        c, _ = jax.lax.scan(body, seg0, None, length=K)
        return c

    fnK = jax.jit(chained)
    jax.block_until_ready(fnK(seg))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fnK(seg))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label}: {best * 1000:.3f} ms", flush=True)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.dsp.framing import frame_signal
    from speech_diarization_tpu.dsp.mel import (
        _dft_matrices, mel_filterbank,
    )
    from speech_diarization_tpu.dsp.stft import hann_window
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)
    win, hop, wpc = 2 * SR, SR // 10, 600
    margin = 4 * SR
    span = 2 * margin + (wpc - 1) * hop + win
    seg = jnp.asarray(
        np.random.default_rng(0).standard_normal(span).astype(np.float32))

    n_fft, mhop = 400, 160
    window = hann_window(n_fft, periodic=True)
    cos_m, msin_m = _dft_matrices(n_fft)
    fb = mel_filterbank(n_fft // 2 + 1, 20.0, SR / 2 - 100.0, 80, SR)

    def pad(y):
        return jnp.pad(y[None], ((0, 0), (n_fft // 2, n_fft // 2)),
                       mode="reflect")

    def frames_(y):
        return frame_signal(pad(y), n_fft, mhop, pad_tail=False)

    def windowed(y):
        return frames_(y) * window[None, None, :]

    def dft(y):
        f = windowed(y)
        real = jnp.einsum("bnt,tk->bnk", f, jnp.asarray(cos_m))
        imag = jnp.einsum("bnt,tk->bnk", f, jnp.asarray(msin_m))
        return real * real + imag * imag

    def full(y):
        return jnp.log(jnp.einsum("bnk,km->bnm", dft(y), fb) + 1e-6)

    amortized(pad, seg, label="pad")
    amortized(frames_, seg, label="pad+frame")
    amortized(windowed, seg, label="pad+frame+window")
    amortized(dft, seg, label="pad+frame+window+dft+power")
    amortized(full, seg, label="full log-mel")


if __name__ == "__main__":
    main()
