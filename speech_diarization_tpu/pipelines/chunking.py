"""Fixed-shape chunked execution over arbitrarily long audio.

XLA compiles one program per input shape, so per-file shapes would recompile
constantly.  All framewise model passes (VAD probs, features) therefore run on
fixed-length chunks with a small overlap: every file, of any length, reuses the
same compiled executable.  In the overlap region the EARLIER chunk wins (it has
full left context for those frames), which makes the stitch exactly contiguous
for causal framewise models.

This is the TPU-native generalization of the reference's ad-hoc chunked
streaming (``gtcrn_wrap.py:101-153``, ``vad.py:44-48`` — SURVEY.md §5
'Long-context / sequence scaling').
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


GROUP_BUCKETS = (4, 8, 16, 32, 64)

# jitted gather+model wrappers, keyed by (fn, chunk) so the traced program is
# REUSED across calls (a closure-local jit would re-trace per file)
_GROUP_FN_CACHE: dict = {}


def _get_group_fn(fn: Callable, chunk: int) -> Callable:
    """ONE dispatch per group: chunk gather + model fused under a single jit.
    Eager per-chunk dynamic_slice ops cost a tunnel round trip each
    (~25 ms x 43 chunks dominated the whole VAD stage before).  Falls back to
    eager gather for functions that cannot be traced (host/numpy closures) —
    the failure surfaces at trace time, before any device compile."""
    key = (fn, chunk)
    if key not in _GROUP_FN_CACHE:

        def _gather(y, starts, n_pad):
            segs = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(y, s, chunk))(starts)
            if n_pad:
                segs = jnp.pad(segs, ((0, n_pad), (0, 0)))
            return segs

        _jitted = partial(jax.jit, static_argnames=("n_pad",))(
            lambda y, starts, n_pad: fn(_gather(y, starts, n_pad)))

        def _eager(y, starts, n_pad):
            return fn(_gather(y, starts, n_pad))

        state = {"fn": None}

        def dispatch(y, starts, n_pad):
            if state["fn"] is None:
                try:
                    out = _jitted(y, starts, n_pad)
                    state["fn"] = _jitted
                    return out
                except (jax.errors.TracerArrayConversionError,
                        jax.errors.ConcretizationTypeError,
                        TypeError, ValueError):
                    state["fn"] = _eager
            return state["fn"](y, starts, n_pad)

        _GROUP_FN_CACHE[key] = dispatch
    return _GROUP_FN_CACHE[key]


def chunked_framewise(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    y: np.ndarray | jnp.ndarray,
    sr: int,
    frame_hop: int,
    chunk_s: float = 15.0,
    overlap_s: float = 1.0,
    frames_per_chunk_extra: int = 1,
    group: int | None = None,
    edge_margin_frames: int = 25,
    defer: bool = False,
) -> np.ndarray | Callable[[], np.ndarray]:
    """Apply a framewise model over a long waveform with constant shapes.

    ``fn`` maps [..., T_chunk] -> [..., F_chunk] with
    ``F_chunk = chunk_samples // frame_hop + frames_per_chunk_extra`` (the
    center=True STFT convention) and must accept a leading batch dimension:
    chunks are evaluated ``group`` at a time in ONE dispatch (a [G, T_chunk]
    batch keeps the MXU wide and amortizes tunnel/dispatch latency).  Returns
    the stitched [n_frames_total] array with
    ``n_frames_total = len(y) // frame_hop + frames_per_chunk_extra``.

    ``group=None`` picks the smallest GROUP_BUCKETS entry covering the whole
    file (one dispatch when possible).  Sequential-scan models (the GRU VAD)
    pay wall-clock per scan STEP, not per batch row, so a 10-minute file as
    one [43->64, T_chunk] dispatch runs ~5x faster than eleven [4, T_chunk]
    dispatches (measured 3.0 s -> 0.5 s on the axon chip); shapes stay
    bucketed so at most len(GROUP_BUCKETS) variants ever compile.
    """
    # shape only — np.asarray(y) here would round-trip the ENTIRE waveform
    # through the (degraded) device->host link just to read a dimension
    t = int(y.shape[-1])
    chunk = int(round(chunk_s * sr))
    hop_samples = chunk - int(round(overlap_s * sr))
    assert hop_samples % frame_hop == 0, "chunk hop must align to frame hop"

    n_frames_total = t // frame_hop + frames_per_chunk_extra
    frames_per_chunk = chunk // frame_hop + frames_per_chunk_extra
    chunk_hop_frames = hop_samples // frame_hop

    yj = jnp.asarray(y)
    if t <= chunk:
        padded = jnp.pad(yj, (0, chunk - t))
        dev = fn(padded[None])

        def finish_small() -> np.ndarray:
            return np.asarray(dev)[0][:n_frames_total]

        return finish_small if defer else finish_small()

    n_chunks = int(np.ceil((t - chunk) / hop_samples)) + 1
    total_needed = (n_chunks - 1) * hop_samples + chunk
    if total_needed > t:
        yj = jnp.pad(yj, (0, total_needed - t))

    if group is None:
        group = next((b for b in GROUP_BUCKETS if b >= n_chunks), GROUP_BUCKETS[-1])

    out = np.zeros(n_frames_total, dtype=np.float32)
    overlap_frames = frames_per_chunk - chunk_hop_frames
    # A chunk's last few frames see reflect-padded context instead of the true
    # signal; sacrifice `m` edge frames to the next chunk, whose copies have
    # real context (and overlap-m frames of left warmup for causal models).
    m = min(edge_margin_frames, max(overlap_frames - 1, 0))

    _group_fn = _get_group_fn(fn, chunk)
    pending = []
    for g0_chunk in range(0, n_chunks, group):
        g1_chunk = min(g0_chunk + group, n_chunks)
        starts = jnp.arange(g0_chunk, g1_chunk) * hop_samples
        # dispatch only — device results are pulled in finish(), so callers
        # can overlap other dispatches/host work with this compute
        pending.append(
            (g0_chunk, g1_chunk,
             _group_fn(yj, starts, group - (g1_chunk - g0_chunk))))

    def finish() -> np.ndarray:
        for g0c, g1c, dev in pending:
            probs_g = np.asarray(dev)
            for j, k in enumerate(range(g0c, g1c)):
                lo = 0 if k == 0 else overlap_frames - m
                hi = frames_per_chunk if k == n_chunks - 1 else frames_per_chunk - m
                a = k * chunk_hop_frames + lo
                b = min(a + (hi - lo), n_frames_total)
                out[a:b] = probs_g[j, lo : lo + (b - a)]
        return out

    if defer:
        return finish
    return finish()
