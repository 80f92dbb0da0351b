"""STFT / iSTFT with static shapes, matching ``torch.stft``/``torch.istft``
semantics used by the reference GTCRN runner (``gtcrn_wrap.py:64-93``):
center=True with reflect padding, sqrt-Hann window, length-restoring inverse.

Two execution paths:
  * ``jnp.fft.rfft`` (XLA FFT) — default.
  * matmul DFT (``matmul=True``) — frames @ [win, 2*n_bins] cos/sin matrix.
    On TPU this rides the MXU and fuses with neighbors; preferred inside
    larger jitted graphs for the small FFT sizes used here (n_fft<=512).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal
from .ola import overlap_add


def hann_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Matches ``torch.hann_window`` (periodic=True by default)."""
    m = n if periodic else n - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(m, 1))
    return jnp.asarray(w, dtype=dtype)


def sqrt_hann_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """sqrt(Hann), the analysis/synthesis window of ``gtcrn_wrap.py:47`` and
    ``zipenhancex.py:181-183``."""
    return jnp.sqrt(jnp.clip(hann_window(n, periodic, dtype), 0.0, None))


@lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis as two dense [n_fft, n_bins] matrices (cos, -sin)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=8)
def _idft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis: frames = Re @ Ci_r + Im @ Ci_i, [n_bins, n_fft].

    Interior bins count twice (conjugate symmetry); DC and Nyquist once.
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    ci_r = (w * np.cos(ang) / n_fft).astype(np.float32)
    ci_i = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return ci_r, ci_i


# DFT execution mode: 'fft' uses XLA's FFT, 'matmul' rides the MXU.  The
# matmul path is both the TPU-performance choice for these small transforms
# (n_fft <= 512) and the compatibility choice for backends without an FFT
# lowering (the experimental axon TPU backend).
DEFAULT_DFT_MODE = "matmul"


def _use_matmul(matmul: bool | None) -> bool:
    if matmul is None:
        return DEFAULT_DFT_MODE == "matmul"
    return matmul


def stft(
    y: jax.Array,
    n_fft: int = 512,
    hop: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    matmul: bool | None = None,
) -> jax.Array:
    """STFT of [..., T] -> complex [..., n_bins, n_frames] (torch layout).

    With ``center=True`` the signal is reflect-padded by ``n_fft//2`` on both
    sides, so n_frames = 1 + T//hop (torch.stft default behavior).
    """
    win_length = win_length or n_fft
    if window is None:
        window = sqrt_hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    squeeze = y.ndim == 1
    if squeeze:
        y = y[None, :]

    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    frames = frame_signal(y, n_fft, hop, pad_tail=False)  # [B, n, n_fft]
    frames = frames * window[None, None, :]

    if _use_matmul(matmul):
        cos_m, msin_m = _dft_matrices(n_fft)
        real = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(cos_m),
                          precision=jax.lax.Precision.HIGHEST)
        imag = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(msin_m),
                          precision=jax.lax.Precision.HIGHEST)
        spec = real + 1j * imag
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)

    spec = jnp.transpose(spec, (0, 2, 1))  # [B, n_bins, n_frames]
    return spec[0] if squeeze else spec


def istft(
    spec: jax.Array,
    n_fft: int = 512,
    hop: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
    matmul: bool | None = None,
) -> jax.Array:
    """Inverse STFT of complex [..., n_bins, n_frames] -> [..., T].

    Standard weighted overlap-add with window-square normalization, matching
    ``torch.istft`` (``gtcrn_wrap.py:85-93``).
    """
    win_length = win_length or n_fft
    if window is None:
        window = sqrt_hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    squeeze = spec.ndim == 2
    if squeeze:
        spec = spec[None]

    spec_nt = jnp.transpose(spec, (0, 2, 1))  # [B, n_frames, n_bins]
    if _use_matmul(matmul):
        ci_r, ci_i = _idft_matrices(n_fft)
        frames = (
            jnp.einsum("bnk,kt->bnt", jnp.real(spec_nt), jnp.asarray(ci_r),
                       precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("bnk,kt->bnt", jnp.imag(spec_nt), jnp.asarray(ci_i),
                         precision=jax.lax.Precision.HIGHEST)
        )
    else:
        frames = jnp.fft.irfft(spec_nt, n=n_fft, axis=-1)
    frames = frames * window[None, None, :]

    y = overlap_add(frames, hop)  # [B, T_pad]
    wsq = overlap_add(
        jnp.broadcast_to((window * window)[None, None, :], frames.shape), hop
    )
    y = y / jnp.maximum(wsq, 1e-11)

    if center:
        pad = n_fft // 2
        y = y[:, pad:]
        if length is not None:
            y = y[:, :length]
        else:
            y = y[:, : y.shape[1] - pad]
    elif length is not None:
        y = y[:, :length]
    return y[0] if squeeze else y


def stft_ri(
    y: jax.Array,
    n_fft: int = 512,
    hop: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
) -> jax.Array:
    """Complex-free STFT: [..., T] -> real [..., n_bins, n_frames, 2].

    Pure real matmul arithmetic end to end (no complex HLOs — safest path on
    experimental backends), same layout as ``spec_as_real(stft(...))``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = sqrt_hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    squeeze = y.ndim == 1
    if squeeze:
        y = y[None, :]
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop, pad_tail=False) * window[None, None, :]
    cos_m, msin_m = _dft_matrices(n_fft)
    real = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(cos_m),
                      precision=jax.lax.Precision.HIGHEST)
    imag = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(msin_m),
                      precision=jax.lax.Precision.HIGHEST)
    out = jnp.stack([real, imag], axis=-1)  # [B, n, k, 2]
    out = jnp.transpose(out, (0, 2, 1, 3))  # [B, k, n, 2]
    return out[0] if squeeze else out


def istft_ri(
    spec_ri: jax.Array,
    n_fft: int = 512,
    hop: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Complex-free inverse STFT: real [..., n_bins, n_frames, 2] -> [..., T]."""
    win_length = win_length or n_fft
    if window is None:
        window = sqrt_hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    squeeze = spec_ri.ndim == 3
    if squeeze:
        spec_ri = spec_ri[None]
    # [B, k, n, 2] -> [B, n, k]
    real = jnp.transpose(spec_ri[..., 0], (0, 2, 1))
    imag = jnp.transpose(spec_ri[..., 1], (0, 2, 1))
    ci_r, ci_i = _idft_matrices(n_fft)
    frames = (
        jnp.einsum("bnk,kt->bnt", real, jnp.asarray(ci_r),
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("bnk,kt->bnt", imag, jnp.asarray(ci_i),
                     precision=jax.lax.Precision.HIGHEST)
    )
    frames = frames * window[None, None, :]
    y = overlap_add(frames, hop)
    wsq = overlap_add(
        jnp.broadcast_to((window * window)[None, None, :], frames.shape), hop
    )
    y = y / jnp.maximum(wsq, 1e-11)
    if center:
        pad = n_fft // 2
        y = y[:, pad:]
        y = y[:, :length] if length is not None else y[:, : y.shape[1] - pad]
    elif length is not None:
        y = y[:, :length]
    return y[0] if squeeze else y


def spec_as_real(spec: jax.Array) -> jax.Array:
    """complex [..., F, T] -> real [..., F, T, 2] (torch.view_as_real layout,
    the GTCRN input contract at ``gtcrn.py:292-296``)."""
    return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)


def real_as_spec(x: jax.Array) -> jax.Array:
    """real [..., F, T, 2] -> complex [..., F, T]."""
    return x[..., 0] + 1j * x[..., 1]
