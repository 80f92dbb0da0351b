#!/usr/bin/env python
"""On-chip micro-bench: pallas vs decomposed grid-ASP embed chunk.

Measures the production embed-grid chunk dispatch (the pipeline's hottest
program — BENCH r2/r3 rooflines put it HBM-bound) with BOTH ASP backends,
using the same amortized chained-scan method as bench.py's roofline section
(K on-chip executions per tunnel round trip, so the ~25 ms axon dispatch
latency does not mask the compute difference).

    python scripts/bench_asp_grid.py            # chip
    python scripts/bench_asp_grid.py --cpu      # CPU sanity (decomposed only)
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(model, params, backend: str, iters: int = 4, K: int = 16):
    import jax
    import jax.numpy as jnp

    os.environ["SDTPU_ASP_BACKEND"] = backend
    sr = 16000
    win, hop, wpc = 2 * sr, sr // 10, 600
    margin = 4 * sr
    span = 2 * margin + (wpc - 1) * hop + win
    seg = jnp.asarray(
        np.random.default_rng(0).standard_normal(span).astype(np.float32))

    def chained(seg0):
        def body(carry, _):
            o = model.encode_grid_chunk(params, carry, wpc, margin, win, hop)
            dep = (jnp.sum(o) * jnp.float32(1e-12)).astype(carry.dtype)
            return carry + dep, None

        c, _ = jax.lax.scan(body, seg0, None, length=K)
        return c

    fnK = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(fnK(seg))
    print(f"{backend}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fnK(seg))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{backend}: chunk {best * 1000:.2f} ms (chained K={K}, "
          f"best of {iters})", flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backends", default="pallas,decomposed")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(Path(__file__).resolve().parents[1])

    import jax.numpy as jnp

    from speech_diarization_tpu.train.recipes import load_speaker_encoder
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    model, params = load_speaker_encoder(
        prefer_weights(ENCODER_PREFERENCE), dtype=jnp.bfloat16)
    print(f"device: {jax.devices()[0]}", flush=True)
    for b in args.backends.split(","):
        measure(model, params, b)


if __name__ == "__main__":
    main()
