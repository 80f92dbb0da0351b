"""Training objectives: AAM-softmax (speaker ID), SI-SNR (enhancement),
frame BCE (VAD)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def aam_softmax_loss(
    embeddings: jax.Array,  # [B, D]
    weights: jax.Array,     # [n_classes, D] (class prototypes)
    labels: jax.Array,      # [B] int
    margin: float = 0.2,
    scale: float = 30.0,
) -> jax.Array:
    """Additive angular margin softmax (ArcFace), the standard speaker-ID
    objective for ECAPA-class encoders."""
    e = embeddings / (jnp.linalg.norm(embeddings, axis=1, keepdims=True) + 1e-8)
    w = weights / (jnp.linalg.norm(weights, axis=1, keepdims=True) + 1e-8)
    cos = e @ w.T  # [B, C]
    theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    target_cos = jnp.cos(theta + margin)
    onehot = jax.nn.one_hot(labels, weights.shape[0])
    logits = scale * (onehot * target_cos + (1.0 - onehot) * cos)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def si_snr_loss(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Negative scale-invariant SNR (dB) between estimated and reference
    waveforms [B, T] — the enhancement objective."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True)
            / (jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = (jnp.sum(proj * proj, axis=-1) + eps) / (jnp.sum(noise * noise, axis=-1) + eps)
    return -jnp.mean(10.0 * jnp.log10(ratio))


def bce_vad_loss(probs: jax.Array, targets: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Frame-level binary cross-entropy for VAD training."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
