"""Overlap-add reconstruction (the reference's Fold / scatter_add_ patterns).

Replaces ``nn.Fold``-based OLA (``gtcrn_wrap.py:124-151``) and the
``scatter_add_`` OLA of ZipEnhancer windowed inference (``zipenhancex.py:43-57``).

On TPU, scatter-add over a [n_frames, win] index grid is the direct lowering;
for hop dividing win we also expose a reshape-based fast path that XLA turns
into pure adds (no scatter at all).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Fold frames [..., n, win] back to a signal [..., (n-1)*hop + win].

    Frames are added at offsets ``i*hop`` (no normalization — compose with
    :func:`ola_normalization` or window-square division as needed).
    """
    squeeze = frames.ndim == 2
    if squeeze:
        frames = frames[None]
    b, n, win = frames.shape
    t_out = (n - 1) * hop + win

    if win % hop == 0 and n > 0:
        y = _overlap_add_reshape(frames, hop, t_out)
    else:
        idx = (jnp.arange(n) * hop)[:, None] + jnp.arange(win)[None, :]
        y = jnp.zeros((b, t_out), dtype=frames.dtype)
        y = y.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))
    return y[0] if squeeze else y


def _overlap_add_reshape(frames: jax.Array, hop: int, t_out: int) -> jax.Array:
    """Scatter-free OLA when ``hop`` divides ``win``: split each frame into
    win//hop hop-sized slots, pad each stream, and sum K shifted reshapes."""
    b, n, win = frames.shape
    k = win // hop
    # [B, n, k, hop]
    parts = frames.reshape(b, n, k, hop)
    out = jnp.zeros((b, t_out), dtype=frames.dtype)
    for j in range(k):
        # part j of frame i lands at offset (i + j) * hop
        stream = parts[:, :, j, :].reshape(b, n * hop)  # contiguous at i*hop
        out = out.at[:, j * hop : j * hop + n * hop].add(stream)
    return out


def ola_normalization(n: int, win: int, hop: int, window: jax.Array | None = None) -> jax.Array:
    """Sum of (optionally windowed) ones folded at stride ``hop`` — the
    denominator of weighted OLA (``gtcrn_wrap.py:129-132``, ``zipenhancex.py:55-57``).

    Returns [ (n-1)*hop + win ] weights, clamped away from zero.
    """
    if window is None:
        w = jnp.ones((win,), dtype=jnp.float32)
    else:
        w = window
    frames = jnp.broadcast_to(w[None, None, :], (1, n, win))
    den = overlap_add(frames, hop)[0]
    return jnp.maximum(den, 1e-8)
