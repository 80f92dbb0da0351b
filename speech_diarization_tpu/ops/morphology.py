"""1-D binary morphology as reduce-window ops.

Replaces ``scipy.ndimage.binary_opening/closing`` (``vad.py:77-87``).
Erosion = min-pool (all-true window), dilation = max-pool (any-true window),
both lowered by XLA to ``reduce_window`` on the VPU.

scipy semantics notes (matched exactly, tested against scipy):
  * the structuring element of size k is centered at index ``k//2``
    (origin 0 -> for even k the window is right-heavy);
  * out-of-border values are False for both erosion and dilation
    (scipy's default ``border_value=0``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pads(k: int) -> tuple[int, int]:
    # scipy centers even-sized structures at k//2
    left = k // 2
    right = k - 1 - left
    return left, right


def binary_erosion(mask: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return mask
    left, right = _pads(k)
    # float min-pool (rather than a bool reduce_window) — the float lowering
    # is universally supported, including the experimental axon TPU backend
    x = jnp.pad(mask.astype(jnp.float32), (left, right), constant_values=0.0)
    out = jax.lax.reduce_window(x, jnp.inf, jax.lax.min, (k,), (1,), "VALID")
    return out > 0.5


def binary_dilation(mask: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return mask
    # dilation's window is the mirrored structure: origin flips for even k
    right, left = _pads(k)
    x = jnp.pad(mask.astype(jnp.float32), (left, right), constant_values=0.0)
    out = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (k,), (1,), "VALID")
    return out > 0.5


def binary_opening(mask: jax.Array, k: int) -> jax.Array:
    return binary_dilation(binary_erosion(mask, k), k)


def binary_closing(mask: jax.Array, k: int) -> jax.Array:
    return binary_erosion(binary_dilation(mask, k), k)


def morph_open_close(
    mask: jax.Array,
    hop_ms: float,
    open_ms: float = 80.0,
    close_ms: float = 40.0,
) -> jax.Array:
    """Opening (despeckle) then closing (bridge) with ms-sized structures —
    the ``morph_open_close`` chain at ``vad.py:77-87``."""
    out = mask
    if open_ms > 0:
        out = binary_opening(out, max(1, round(open_ms / hop_ms)))
    if close_ms > 0:
        out = binary_closing(out, max(1, round(close_ms / hop_ms)))
    return out
