"""ITU-R BS.1770-4 loudness metering and normalization, on device.

Replaces ``pyloudnorm``-based LUFS normalization (``anti_stick_diarize.py:53-61``,
``diar_diag.py:36-43``, ``zipenhancer_pipe.py:70-95``).

Design: the K-weighting pre-filter (high-shelf + RLB high-pass biquad cascade)
is applied in the frequency domain — the cascade's exact transfer function is
evaluated at rfft bins and multiplied in, with decay padding so the circular
product equals linear IIR filtering to ~1e-6.  A 57M-sample ``lax.scan`` biquad
would serialize the TPU; one rfft/irfft pair does not.  Gating follows
BS.1770-4: 400 ms blocks, 75% overlap, -70 LUFS absolute gate, -10 LU relative
gate.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal


def _high_shelf_coeffs(fs: float, g_db: float = 4.0, fc: float = 1681.9744509555319,
                       q: float = 0.7071752369554196) -> tuple[np.ndarray, np.ndarray]:
    """Stage-1 'spherical head' high-shelf (BS.1770 / pyloudnorm parametrization)."""
    a = 10.0 ** (g_db / 40.0)
    w0 = 2.0 * np.pi * fc / fs
    alpha = np.sin(w0) / (2.0 * q)
    cw = np.cos(w0)
    sa = 2.0 * np.sqrt(a) * alpha
    b = np.array([
        a * ((a + 1) + (a - 1) * cw + sa),
        -2.0 * a * ((a - 1) + (a + 1) * cw),
        a * ((a + 1) + (a - 1) * cw - sa),
    ])
    aa = np.array([(a + 1) - (a - 1) * cw + sa,
                   2.0 * ((a - 1) - (a + 1) * cw),
                   (a + 1) - (a - 1) * cw - sa])
    return b / aa[0], aa / aa[0]


def _high_pass_coeffs(fs: float, fc: float = 38.13547087602444,
                      q: float = 0.5003270373238773) -> tuple[np.ndarray, np.ndarray]:
    """Stage-2 RLB high-pass."""
    w0 = 2.0 * np.pi * fc / fs
    alpha = np.sin(w0) / (2.0 * q)
    cw = np.cos(w0)
    b = np.array([(1 + cw) / 2.0, -(1 + cw), (1 + cw) / 2.0])
    aa = np.array([1 + alpha, -2.0 * cw, 1 - alpha])
    return b / aa[0], aa / aa[0]


def k_weighting_coeffs(fs: float) -> list[tuple[np.ndarray, np.ndarray]]:
    return [_high_shelf_coeffs(fs), _high_pass_coeffs(fs)]


@lru_cache(maxsize=16)
def _k_fir_taps(fs: int) -> np.ndarray:
    """Causal FIR truncation of the biquad cascade's impulse response
    (computed once on host).  The RLB high-pass pole decays below 1e-6 within
    ~1500 samples at 16 kHz (~4000 at 48 kHz); taps are sized accordingly."""
    from scipy import signal as sps

    n_taps = 2048 if fs <= 24000 else 4096
    h = np.zeros(n_taps)
    h[0] = 1.0
    for b, a in k_weighting_coeffs(float(fs)):
        h = sps.lfilter(b, a, h)
    return h.astype(np.float32)


def k_weight(y: jax.Array, fs: int, mode: str = "scan") -> jax.Array:
    """Apply the K-weighting cascade to [T].

    ``mode='scan'`` (default): exact IIR via log-depth associative scans
    (``dsp/iir.py``) — no FFT, no long-kernel conv (both of which the
    experimental axon TPU backend mishandles).
    ``mode='fir'``: truncated-impulse-response convolution (~1e-5 error).
    """
    if mode == "scan":
        from .iir import sos_scan_overlap

        # parallel overlapped chunks: XLA program size (and axon compile
        # time) bounded by the chunk, all chunks in ONE batched scan (the
        # sequential-state variant costs per-chunk step latency on axon);
        # warmup overlap is exact to f32 for these pole radii
        return sos_scan_overlap(y, k_weighting_coeffs(float(fs)))
    t = y.shape[-1]
    h = _k_fir_taps(fs)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    out = jax.lax.conv_general_dilated(
        y[:, None, :],
        jnp.asarray(h[::-1].copy())[None, None, :],
        window_strides=(1,),
        padding=((len(h) - 1, 0),),  # causal
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :t]
    return out[0] if squeeze else out


def integrated_loudness(y: jax.Array, fs: int) -> jax.Array:
    """Gated integrated loudness (LUFS) of a mono [T] waveform; scalar array.

    Returns -inf-ish (-200) for silence (no blocks pass the absolute gate),
    mirroring pyloudnorm's -inf behavior.
    """
    z = k_weight(y, fs)
    block = int(round(0.400 * fs))
    hop = int(round(0.100 * fs))
    if z.shape[-1] < block:
        # too short to meter: fall back to whole-signal mean square
        ms = jnp.mean(z * z)
        return -0.691 + 10.0 * jnp.log10(jnp.maximum(ms, 1e-20))
    frames = frame_signal(z, block, hop, pad_tail=False)  # [n, block]
    msq = jnp.mean(frames * frames, axis=-1)  # [n]
    lb = -0.691 + 10.0 * jnp.log10(jnp.maximum(msq, 1e-20))

    abs_gate = lb > -70.0
    n_abs = jnp.sum(abs_gate)
    mean_abs = jnp.sum(jnp.where(abs_gate, msq, 0.0)) / jnp.maximum(n_abs, 1)
    rel_thresh = -0.691 + 10.0 * jnp.log10(jnp.maximum(mean_abs, 1e-20)) - 10.0

    gate = abs_gate & (lb > rel_thresh)
    n_g = jnp.sum(gate)
    mean_g = jnp.sum(jnp.where(gate, msq, 0.0)) / jnp.maximum(n_g, 1)
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(mean_g, 1e-20))
    return jnp.where(n_g > 0, lufs, -200.0)


def integrated_loudness_host(y: np.ndarray, fs: int) -> float:
    """Host (numpy/scipy) mirror of :func:`integrated_loudness` — exact IIR
    cascade via ``lfilter`` + the same BS.1770-4 gating.

    A host-side oracle for tests and offline tooling.  (It was briefly the
    streamed-ingest gain source, but this host's f64 streaming throughput is
    ~1 M samples/s — 6-19 s for a 10-minute file — so the streamed pipeline
    meters per-chunk on device instead; see pipelines/diarize.py.)
    Agreement with the device path is pinned by tests/test_pipeline.py.
    """
    from scipy import signal as sps

    z = np.asarray(y, np.float64)
    for b, a in k_weighting_coeffs(float(fs)):
        z = sps.lfilter(b, a, z)
    block = int(round(0.400 * fs))
    hop = int(round(0.100 * fs))
    if z.shape[-1] < block:
        ms = float(np.mean(z * z))
        return -0.691 + 10.0 * np.log10(max(ms, 1e-20))
    n = (z.shape[-1] - block) // hop + 1
    # energy per 400 ms block at 75% overlap from a cumulative sum (O(T))
    cs = np.concatenate([[0.0], np.cumsum(z * z)])
    starts = hop * np.arange(n)
    msq = (cs[starts + block] - cs[starts]) / block
    lb = -0.691 + 10.0 * np.log10(np.maximum(msq, 1e-20))
    abs_gate = lb > -70.0
    if not abs_gate.any():
        return -200.0
    mean_abs = msq[abs_gate].mean()
    rel_thresh = -0.691 + 10.0 * np.log10(max(mean_abs, 1e-20)) - 10.0
    gate = abs_gate & (lb > rel_thresh)
    if not gate.any():
        return -200.0
    return -0.691 + 10.0 * np.log10(max(float(msq[gate].mean()), 1e-20))


def loudness_normalize(
    y: jax.Array, fs: int, target_lufs: float = -18.0, clip: float = 0.99
) -> jax.Array:
    """Scale ``y`` to the target integrated loudness, then clip — the behavior
    of ``loudness_normalize`` at ``anti_stick_diarize.py:53-61``.  Silent input
    is passed through unscaled (``diar_diag.py:37-43`` try/except intent)."""
    lufs = integrated_loudness(y, fs)
    gain = 10.0 ** ((target_lufs - lufs) / 20.0)
    gain = jnp.where(lufs <= -199.0, 1.0, gain)
    return jnp.clip(y * gain, -clip, clip)
