"""Kaldi-style log-mel filterbank features, on device.

Replaces ``fbank_batch`` (``speech_encode.py:10-38``), which rebuilt a
``torchaudio.MelSpectrogram`` module and re-uploaded its filters to CUDA on
EVERY call (SURVEY.md §2.5 item 5).  Here the mel matrix is a cached constant
baked into the jitted graph, and the whole pipeline —
frame → window → |DFT|² → mel → log → mean-norm — is a chain of MXU matmuls
and fused elementwise ops.  A fused Pallas kernel for the same computation
lives in ``ops/pallas/fused_fbank.py``.

Contract (matches torchaudio defaults used by the reference):
  win = hop*2.5 = 25 ms, hop = 10 ms, n_fft = win_length, Hann window,
  center=True reflect pad, power=2, HTK mel scale, no filterbank norm,
  f_min=20, f_max=sr/2-100, log(x + 1e-6), per-utterance mean-norm over time.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal
from .stft import hann_window, _dft_matrices


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def _mel_filterbank_np(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """Triangular HTK-scale mel filterbank [n_freqs, n_mels], norm=None —
    the ``torchaudio.functional.melscale_fbanks`` construction."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = _hz_to_mel(f_min), _hz_to_mel(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> jax.Array:
    return jnp.asarray(_mel_filterbank_np(n_freqs, f_min, f_max, n_mels, sample_rate))


def _fbank_backend() -> str:
    """'matmul' (default) or 'fused' (Pallas kernel, ops/pallas/fused_fbank).

    Resolution: SDTPU_FBANK_BACKEND env overrides; otherwise matmul.  The
    fused kernel is opt-in until its on-chip timing wins are recorded by the
    bench (it cannot be try/except'd at runtime — a failed compile poisons
    the axon process, utils/backend.py).
    """
    import os

    return os.environ.get("SDTPU_FBANK_BACKEND", "matmul")


def log_mel_spectrogram(
    y: jax.Array,
    sample_rate: int = 16000,
    n_mels: int = 80,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    f_min: float = 20.0,
    f_max: float | None = None,
    eps: float = 1e-6,
    center: bool = True,
    backend: str | None = None,
) -> jax.Array:
    """[B, T] waveforms -> [B, n_frames, n_mels] log-mel features.

    The matmul-DFT power spectrum keeps everything on the MXU; with
    center=True, reflect-pads n_fft//2 per side (torchaudio default).
    ``backend='fused'`` routes through the Pallas kernel instead
    (center=True only).
    """
    if y.ndim == 1:
        y = y[None]
    if (backend or _fbank_backend()) == "fused" and center:
        import jax as _jax

        from ..ops.pallas.fused_fbank import fused_log_mel

        return fused_log_mel(
            y, sample_rate=sample_rate, n_mels=n_mels, win_ms=win_ms,
            hop_ms=hop_ms, f_min=f_min, f_max=f_max, eps=eps,
            # pallas has no compiled CPU lowering; interpret keeps the gate
            # testable on the CPU mesh
            interpret=_jax.default_backend() == "cpu",
        )
    win = int(sample_rate * win_ms / 1000.0)
    hop = int(sample_rate * hop_ms / 1000.0)
    n_fft = win
    f_max = f_max if f_max is not None else sample_rate / 2 - 100.0

    if y.shape[0] == 1 and center and n_fft <= 3 * hop:
        # single-waveform fast path (the streaming trunk's shape): every op
        # here stays 1-D or [n, hop]-blocked.  A [1, T] 2-D signal gets the
        # degenerate T(1,128) tiling — one sublane of eight — and the
        # profiler showed the reflect pad (2.8 ms), reshape (1.0 ms) and
        # f32->bf16 converts (1.9 ms) running at ~1/8 efficiency while the
        # DFT matmuls were 0.44 ms (xplane trace, 2026-08-21).
        return _log_mel_1d(y[0], sample_rate, n_mels, n_fft, hop,
                           f_min, f_max, eps)[None]

    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    frames = frame_signal(y, n_fft, hop, pad_tail=False)  # [B, n, n_fft]
    # The Hann window FOLDS INTO the DFT matrices (windowing is elementwise
    # on the contraction axis: sum_t f_t*w_t*cos(tk) = f @ (w ⊙ cos)) —
    # measured 2026-08-21 (scripts/bench_fbank_stages.py, chip, streaming
    # chunk shape): the explicit ``frames * window`` broadcast forced the
    # lazily-framed [B, n, n_fft] tensor to materialize and cost 1.74 ms of
    # the 1.76 ms fbank wall, while the DFT einsums consuming the fused
    # framing were ~0.02 ms.  Same math, zero extra ops.
    # pure-numpy periodic Hann (same formula as stft.hann_window, which
    # returns a jnp array — not convertible back to numpy inside a trace)
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
              ).astype(np.float32)
    cos_m, msin_m = _dft_matrices(n_fft)
    cos_m = cos_m * window[:, None]
    msin_m = msin_m * window[:, None]
    if (backend or _fbank_backend()) == "matmul-bf16":
        # bf16 DFT operands, f32 accumulation: 2x MXU rate / half the HBM
        # for the one matmul that dominates the streaming trunk's fbank
        # (bench_trunk.py attribution).  Audio is [-1, 1] so bf16's 8-bit
        # mantissa costs ~3e-3 relative on the waveform; the log compresses
        # it further and the trunk runs bf16 anyway.  Opt-in via
        # SDTPU_FBANK_BACKEND=matmul-bf16; parity gated in tests.
        fb16 = frames.astype(jnp.bfloat16)
        real = jnp.einsum("bnt,tk->bnk", fb16,
                          jnp.asarray(cos_m).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        imag = jnp.einsum("bnt,tk->bnk", fb16,
                          jnp.asarray(msin_m).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    else:
        real = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(cos_m))
        imag = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(msin_m))
    power = real * real + imag * imag  # [B, n, n_bins]

    fb = mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    mel = jnp.einsum("bnk,km->bnm", power, fb)
    return jnp.log(mel + eps)


@lru_cache(maxsize=8)
def _blocked_dft_weights(n_fft: int, hop: int, n_blocks: int):
    """Windowed DFT basis split into ``n_blocks`` per-block [hop, n_bins]
    factors (zero rows beyond n_fft), for the blocked 1-D fast path."""
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
              ).astype(np.float32)
    cos_m, msin_m = _dft_matrices(n_fft)
    n_bins = cos_m.shape[1]
    cw = np.zeros((n_blocks * hop, n_bins), np.float32)
    sw = np.zeros((n_blocks * hop, n_bins), np.float32)
    cw[:n_fft] = cos_m * window[:, None]
    sw[:n_fft] = msin_m * window[:, None]
    return ([cw[j * hop:(j + 1) * hop] for j in range(n_blocks)],
            [sw[j * hop:(j + 1) * hop] for j in range(n_blocks)])


def _log_mel_1d(y: jax.Array, sample_rate: int, n_mels: int, n_fft: int,
                hop: int, f_min: float, f_max: float, eps: float) -> jax.Array:
    """[T] -> [n_frames, n_mels] log-mel via the BLOCKED windowed DFT.

    Frame ``i`` starts at sample ``i*hop`` of the reflect-padded signal and
    spans ``n_blocks*hop`` samples (DFT rows past n_fft are zero), so
    ``real = sum_j blocks[j:j+n] @ Wc[j]`` over CONTIGUOUS slices of the
    [n_blocks_total, hop] block-reshaped signal: no framed tensor, no
    concat feeding the matmul, and — the actual win — no [1, T] layout
    anywhere (see the call-site comment).  Algebraically identical to the
    frame+einsum path; summation order differs (parity gated in
    tests/test_dsp.py)."""
    pad = n_fft // 2
    yp = jnp.concatenate([y[1:pad + 1][::-1], y, y[-pad - 1:-1][::-1]])
    n_blocks = -(-n_fft // hop)
    t = yp.shape[0]
    n = (t - n_fft) // hop + 1
    nb = n + n_blocks - 1
    # zero-pad to nb whole blocks: padded samples only meet the ZERO rows
    # of the block weights (n_fft <= n_blocks*hop), so the result is exact
    yp = jnp.pad(yp, (0, max(0, nb * hop - t)))
    blocks = yp[:nb * hop].reshape(nb, hop)
    wc, ws = _blocked_dft_weights(n_fft, hop, n_blocks)
    real = sum(blocks[j:j + n] @ jnp.asarray(wc[j]) for j in range(n_blocks))
    imag = sum(blocks[j:j + n] @ jnp.asarray(ws[j]) for j in range(n_blocks))
    power = real * real + imag * imag                       # [n, n_bins]
    fb = mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    return jnp.log(power @ fb + eps)


def fbank_batch(
    wavs: jax.Array,
    sample_rate: int = 16000,
    n_mels: int = 80,
    mean_norm: bool = True,
) -> jax.Array:
    """Drop-in equivalent of the reference's ``fbank_batch``
    (``speech_encode.py:10-38``): [B, n_samples] -> [B, T, n_mels],
    log-mel with optional per-utterance mean normalization."""
    feat = log_mel_spectrogram(wavs, sample_rate=sample_rate, n_mels=n_mels)
    if mean_norm:
        feat = feat - jnp.mean(feat, axis=1, keepdims=True)
    return feat
