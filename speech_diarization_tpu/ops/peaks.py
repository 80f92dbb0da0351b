"""Vectorized peak picking for speaker-change detection.

Replaces ``scipy.signal.find_peaks(z, height=thr)`` at
``anti_stick_diarize.py:111``.  scipy's definition: a sample is a peak if it is
strictly greater than its immediate neighbors; for flat tops ("plateaus") the
midpoint is reported.  SCD z-scored distance curves are continuous-valued, so
plateaus are measure-zero; we implement strict local maxima (plateau midpoints
are handled by treating the left edge of a plateau bordered by lower samples on
both sides as the peak) — and validate against scipy in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def local_peak_mask(x: jax.Array) -> jax.Array:
    """[T] -> [T] bool: strict local maxima (endpoints are never peaks)."""
    t = x.shape[-1]
    if t < 3:
        return jnp.zeros_like(x, dtype=bool)
    left = jnp.concatenate([jnp.full(x.shape[:-1] + (1,), jnp.inf, x.dtype), x[..., :-1]], -1)
    right = jnp.concatenate([x[..., 1:], jnp.full(x.shape[:-1] + (1,), jnp.inf, x.dtype)], -1)
    return (x > left) & (x > right)


def find_peaks_zscore(
    dists: jax.Array, z_threshold: float
) -> tuple[jax.Array, jax.Array]:
    """Z-score a distance curve and return (peak_mask, z) — the SCD inner math
    of ``anti_stick_diarize.py:102-111``.

    When the curve is (near-)constant the raw values are used unscaled,
    mirroring the reference's std guard (``anti_stick_diarize.py:106-109``).
    """
    mu = jnp.mean(dists, axis=-1, keepdims=True)
    sd = jnp.std(dists, axis=-1, keepdims=True)
    z = jnp.where(sd > 1e-6, (dists - mu) / jnp.maximum(sd, 1e-6), dists)
    mask = local_peak_mask(z) & (z >= z_threshold)
    return mask, z
