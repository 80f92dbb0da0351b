"""Windowed framing of waveforms into dense [n_frames, win] grids.

Replaces ``librosa.util.frame`` (``vad.py:9-16``) and the manual index-grid
framing of ``diar_diag.py:48-56``.  Unlike the reference's ``vad.py`` flavor
(which silently drops trailing samples shorter than one window — SURVEY.md §2.5
item 6) we implement the *intended* behavior: zero-pad the tail so every sample
is covered, like ``diar_diag.py``.

TPU note: we deliberately avoid both integer gathers (slow layout on TPU) and
``conv_general_dilated_patches`` (an identity-kernel convolution, which on TPU
routes f32 data through the bf16 MXU and *rounds the audio samples*).  Instead
frames are built from k = ceil(win/hop) shifted reshapes — pure slice/reshape
ops, bit-exact, and lowered by XLA to plain copies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def num_frames(n_samples: int, win: int, hop: int, pad_tail: bool = True) -> int:
    """Number of frames produced by :func:`frame_signal` (python ints only)."""
    if n_samples <= 0:
        return 0
    if n_samples < win:
        return 1 if pad_tail else 0
    n_full = 1 + (n_samples - win) // hop
    if pad_tail and (n_samples - win) % hop != 0:
        return n_full + 1
    return n_full


def frame_signal(
    y: jax.Array,
    win: int,
    hop: int,
    pad_tail: bool = True,
) -> jax.Array:
    """Slice a waveform [..., T] into overlapping frames [..., n, win].

    Static shapes: ``win``/``hop`` must be python ints; the number of frames is
    derived from the (static) length of ``y``.
    """
    if y.ndim == 1:
        return _frame_2d(y[None, :], win, hop, pad_tail)[0]
    if y.ndim == 2:
        return _frame_2d(y, win, hop, pad_tail)
    raise ValueError(f"expected 1D or 2D waveform, got shape {y.shape}")


def _frame_2d(y: jax.Array, win: int, hop: int, pad_tail: bool) -> jax.Array:
    b, t = y.shape
    n = num_frames(t, win, hop, pad_tail)
    if n == 0:
        return jnp.zeros((b, 0, win), dtype=y.dtype)

    # Round the window up to a multiple of hop: frame at win' = k*hop via k
    # shifted contiguous reshapes, then slice back down to `win` columns.
    k = -(-win // hop)  # ceil
    win_p = k * hop
    needed = (n - 1) * hop + win_p
    if needed > t:
        y = jnp.pad(y, ((0, 0), (0, needed - t)))
    # stream j holds samples [j*hop + i*hop : j*hop + (i+1)*hop) of frame i
    parts = [
        jax.lax.dynamic_slice_in_dim(y, j * hop, n * hop, axis=1).reshape(b, n, hop)
        for j in range(k)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # [B, n, win_p]
    if win_p != win:
        frames = frames[:, :, :win]
    return frames


def frame_index_grid(n_samples: int, win: int, hop: int, pad_tail: bool = True):
    """Host-side helper: start sample of each frame (for timestamp math)."""
    import numpy as np

    n = num_frames(n_samples, win, hop, pad_tail)
    return hop * np.arange(n)
