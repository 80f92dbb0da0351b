#!/usr/bin/env python
"""On-chip trunk attribution micro-bench (VERDICT r4 #4).

The r4 roofline put the embed chunk at 3.87-4.02 ms = trunk 2.84 ms + fused
Pallas ASP ~1.0 ms, with the trunk HBM-leaning and the residual blamed on
(a) the sliding-stat chains (fbank mean-norm + per-SE-stage sliding means)
and (b) small-channel dilated convs.  This probe decomposes the trunk wall
at the production chunk shape with the amortized chained-scan method
(bench_asp_grid.py), so kernel work on either axis has a measured
before/after:

  * full        — the production embed chunk (trunk + pallas ASP head);
  * trunk       — fbank + mean-norm + trunk with sliding SE;
  * trunk_nostat— fbank + trunk with GLOBAL SE means and no fbank mean-norm
                  (same convs/BNs, no cumsum chains): the sliding-stat cost
                  is (trunk - trunk_nostat);
  * fbank       — the log-mel frontend alone.

    python scripts/bench_trunk.py            # chip
    python scripts/bench_trunk.py --cpu      # CPU smoke (numbers meaningless)
"""
from __future__ import annotations

import argparse
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
    t0 = time.perf_counter()
    jax.block_until_ready(fnK(seg))
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        # pull ONE scalar instead of block_until_ready: a 2026-08-21 axon
        # session returned from block_until_ready instantly (0.002 ms
        # "timings" for the whole encoder) while the separately-run bench's
        # value-pulling micro-bench read real times — the pull is the only
        # trustworthy barrier on this tunnel
        float(jnp.sum(fnK(seg)))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label}: {best * 1000:.3f} ms (chained K={K}, best of {iters})",
          flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_diarization_tpu.dsp.mel import log_mel_spectrogram
    from speech_diarization_tpu.models.layers import sliding_mean_time
    from speech_diarization_tpu.train.recipes import load_speaker_encoder
    from speech_diarization_tpu.utils.cache import setup_compilation_cache
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    setup_compilation_cache(ROOT)
    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE),
                                         dtype=jnp.bfloat16)
    net = model.net

    win, hop, wpc = 2 * SR, SR // 10, 600
    margin = 4 * SR
    span = 2 * margin + (wpc - 1) * hop + win
    seg = jnp.asarray(
        np.random.default_rng(0).standard_normal(span).astype(np.float32))
    mel_hop = SR * 10 // 1000
    win_f = win // mel_hop + 1

    def full(y):
        return model.encode_grid_chunk(params, y, wpc, margin, win, hop)

    def trunk(y):
        feats = log_mel_spectrogram(y[None], sample_rate=SR, n_mels=net.n_mels)
        feats = feats - jnp.swapaxes(
            sliding_mean_time(jnp.swapaxes(feats, 1, 2), win_f), 1, 2)
        return net.trunk(params, feats, se_win=win_f)[0]

    def trunk_nostat(y):
        feats = log_mel_spectrogram(y[None], sample_rate=SR, n_mels=net.n_mels)
        return net.trunk(params, feats, se_win=None)[0]

    def fbank(y):
        return log_mel_spectrogram(y[None], sample_rate=SR, n_mels=net.n_mels)

    import os

    t_full = amortized(full, seg, label="full")
    t_trunk = amortized(trunk, seg, label="trunk[banded]")
    os.environ["SDTPU_SLIDING_BACKEND"] = "cumsum"
    try:
        t_trunk_cs = amortized(trunk, seg, label="trunk[cumsum]")
        t_full_cs = amortized(full, seg, label="full[cumsum]")
    finally:
        os.environ.pop("SDTPU_SLIDING_BACKEND", None)
    t_nostat = amortized(trunk_nostat, seg, label="trunk_nostat")
    t_fbank = amortized(fbank, seg, label="fbank")

    def fbank_bf16(y):
        return log_mel_spectrogram(y[None], sample_rate=SR, n_mels=net.n_mels,
                                   backend="matmul-bf16")

    t_fb16 = amortized(fbank_bf16, seg, label="fbank[matmul-bf16]")
    if not args.cpu:
        def fbank_fused(y):
            return log_mel_spectrogram(y[None], sample_rate=SR,
                                       n_mels=net.n_mels, backend="fused")

        try:
            amortized(fbank_fused, seg, label="fbank[fused-pallas]")
        except Exception as e:
            print(f"fbank[fused-pallas] failed: {str(e)[:150]}")
    os.environ["SDTPU_FBANK_BACKEND"] = "matmul-bf16"
    try:
        t_full16 = amortized(full, seg, label="full[fbank-bf16]")
        t_trunk16 = amortized(trunk, seg, label="trunk[fbank-bf16]")
    finally:
        os.environ.pop("SDTPU_FBANK_BACKEND", None)
    print(f"fbank bf16 {t_fb16*1e3:.3f} ms vs f32 {t_fbank*1e3:.3f}; "
          f"full w/ bf16 fbank {t_full16*1e3:.3f}, trunk {t_trunk16*1e3:.3f}")
    print(f"\nattribution: full {t_full*1e3:.3f} ms (cumsum {t_full_cs*1e3:.3f})"
          f" | trunk banded {t_trunk*1e3:.3f} vs cumsum {t_trunk_cs*1e3:.3f}"
          f" | sliding-stats {max(t_trunk-t_nostat,0)*1e3:.3f}"
          f" | convs+bn {max(t_nostat-t_fbank,0)*1e3:.3f}"
          f" | fbank {t_fbank*1e3:.3f}"
          f" | asp-head {max(t_full-t_trunk,0)*1e3:.3f}")


if __name__ == "__main__":
    main()
