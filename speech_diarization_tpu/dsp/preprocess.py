"""Waveform preprocessing: DC removal, pre-emphasis, peak clipping.

Replaces the host-side numpy/librosa chain at ``anti_stick_diarize.py:48-49``
and ``diar_diag.py:32-33`` with a single jitted elementwise pass (fused by XLA
with whatever consumes it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def remove_dc(y: jax.Array) -> jax.Array:
    """Subtract the mean (``anti_stick_diarize.py:48``)."""
    return y - jnp.mean(y, axis=-1, keepdims=True)


def preemphasis(y: jax.Array, coef: float = 0.97) -> jax.Array:
    """First-order high-pass ``out[t] = y[t] - coef*y[t-1]``.

    Equivalent to ``librosa.effects.preemphasis`` (``anti_stick_diarize.py:49``)
    up to the first sample's boundary handling (we extend-replicate ``y[0]``).
    """
    prev = jnp.concatenate([y[..., :1], y[..., :-1]], axis=-1)
    return y - coef * prev


def peak_clip(y: jax.Array, limit: float = 0.99) -> jax.Array:
    """Clip to +-limit (``anti_stick_diarize.py:61`` clips to 0.99)."""
    return jnp.clip(y, -limit, limit)


def peak_normalize(y: jax.Array, peak: float = 1.0) -> jax.Array:
    """Divide by the absolute peak when it exceeds ``peak``
    (``zipenhancex.py:143-145``)."""
    m = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.where(m > peak, peak / jnp.maximum(m, 1e-12), 1.0)
    return y * scale


def rms_normalize(y: jax.Array, target_db: float = -25.0) -> jax.Array:
    """Two-stage RMS normalization (``ans_audio_norm``,
    ``zipenhancer_pipe.py:13-34``): scale to target RMS, then rescale by the
    RMS of the above-average-power region (robust to long silences)."""
    target = 10.0 ** (target_db / 20.0)
    rms = jnp.sqrt(jnp.mean(y * y, axis=-1, keepdims=True))
    y = y * (target / (rms + 1e-8))
    power = y * y
    avg = jnp.mean(power, axis=-1, keepdims=True)
    hot = power > avg
    n_hot = jnp.sum(hot, axis=-1, keepdims=True)
    hot_ms = jnp.sum(jnp.where(hot, power, 0.0), axis=-1, keepdims=True) / jnp.maximum(n_hot, 1)
    rms_hot = jnp.sqrt(hot_ms)
    scale = jnp.where(n_hot > 0, target / (rms_hot + 1e-8), 1.0)
    return y * scale


def preprocess_waveform(
    y: jax.Array,
    dc: bool = True,
    preemph: float | None = 0.97,
    clip: float | None = 0.99,
) -> jax.Array:
    """The diarization read-audio preprocessing chain (post loudness-norm),
    mirroring ``diar_read_audio`` (``anti_stick_diarize.py:29-50``)."""
    if dc:
        y = remove_dc(y)
    if preemph is not None:
        y = preemphasis(y, preemph)
    if clip is not None:
        y = peak_clip(y, clip)
    return y
