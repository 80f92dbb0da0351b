"""Sample-rate conversion.

Replaces librosa/soxr resampling (``anti_stick_diarize.py:33-41``,
``diar_diag.py:30``) with:
  * :func:`resample_host` — scipy polyphase on host (I/O path, any length).
  * :func:`resample_poly_jax` — the same polyphase filter expressed as a
    dilated/strided convolution so it runs on-device inside jitted graphs.
"""
from __future__ import annotations

from functools import lru_cache
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps


@lru_cache(maxsize=32)
def _poly_filter(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed lowpass used by ``scipy.signal.resample_poly`` defaults."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float64)


def resample_host(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host polyphase resampling (scipy), float32 out."""
    if orig_sr == target_sr:
        return np.asarray(y, dtype=np.float32)
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    out = sps.resample_poly(np.asarray(y, dtype=np.float64), up, down, axis=-1)
    return out.astype(np.float32)


def resample_poly_jax(y: jax.Array, orig_sr: int, target_sr: int) -> jax.Array:
    """On-device polyphase resampling of [T] or [B, T] waveforms.

    Upsampling is expressed via ``lhs_dilation`` (zero stuffing) and
    downsampling via ``window_strides`` in one ``conv_general_dilated`` —
    XLA lowers this to an efficient strided convolution.  Numerically matches
    :func:`resample_host` (same filter, same phase).
    """
    if orig_sr == target_sr:
        return y
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    h = _poly_filter(up, down).astype(np.float32)

    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    b, t = y.shape
    n_out = -(-t * up // down)  # ceil

    half = (len(h) - 1) // 2
    # scipy aligns the filter's group delay: output k corresponds to input
    # position k*down/up. With lhs_dilation=up the virtual upsampled signal has
    # length (t-1)*up+1; we pad so that tap `half` sits on the first sample.
    lo = half
    needed = (n_out - 1) * down + len(h)  # last window end in upsampled coords
    hi = max(0, needed - lo - ((t - 1) * up + 1))

    out = jax.lax.conv_general_dilated(
        y[:, None, :],  # NCT
        jnp.asarray(h[::-1].copy())[None, None, :],  # OIT (conv = correlation with flipped h)
        window_strides=(down,),
        padding=((lo, hi),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :n_out]
    return out[0] if squeeze else out
