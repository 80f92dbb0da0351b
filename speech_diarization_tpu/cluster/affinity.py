"""Affinity, whitening and adaptive score normalization — all one-matmul ops.

Replaces host sklearn ``cosine_similarity`` calls (``anti_stick_diarize.py:177``,
``diar_diag.py:214``), ``whiten_l2`` (``diar_diag.py:187-194``) and
``asnorm_scores`` (``diar_diag.py:197-208``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jax.Array, eps: float = 1e-8, axis: int = -1) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def cosine_affinity(embs: jax.Array) -> jax.Array:
    """[N, D] -> [N, N] cosine similarity (one MXU matmul)."""
    e = l2_normalize(embs)
    return e @ e.T


def whiten(embs: jax.Array, eps: float = 1e-6) -> jax.Array:
    """ZCA-whiten then L2-normalize (``diar_diag.whiten_l2``): center, eigh of
    the covariance, scale principal axes to unit variance, rotate back.

    The eigendecomposition of the tiny [D, D] covariance runs on host when the
    backend has no eigh lowering (axon); the matmuls stay on device.
    """
    from ..utils.backend import features

    x = embs - jnp.mean(embs, axis=0, keepdims=True)
    n = x.shape[0]
    cov = (x.T @ x) / jnp.maximum(n - 1, 1)
    if features().eigh:
        s, u = jnp.linalg.eigh(cov)  # ascending eigenvalues
        s = jnp.clip(s, 0.0)
        w = (u * (1.0 / jnp.sqrt(s + eps))[None, :]) @ u.T
    else:
        s_np, u_np = np.linalg.eigh(np.asarray(cov))
        s_np = np.clip(s_np, 0.0, None)
        w = jnp.asarray(
            (u_np * (1.0 / np.sqrt(s_np + eps))[None, :]) @ u_np.T
        )
    xw = x @ w
    return l2_normalize(xw, eps=1e-9)


def asnorm_scores(
    query_embs: jax.Array,
    ref_centers: jax.Array,
    cohort_embs: jax.Array,
    topk: int = 200,
) -> jax.Array:
    """Adaptive symmetric score normalization (AS-Norm, the
    ``diar_diag.py:197-208`` semantics): z-norm raw query->center cosine scores
    against each side's top-k cohort statistics, average both directions."""
    q = l2_normalize(query_embs)
    r = l2_normalize(ref_centers)
    c = l2_normalize(cohort_embs)
    raw = q @ r.T  # [Nq, K]
    k = min(topk, c.shape[0])

    qc = jax.lax.top_k(q @ c.T, k)[0]  # [Nq, k]
    rc = jax.lax.top_k(r @ c.T, k)[0]  # [K, k]
    q_mu = jnp.mean(qc, axis=1, keepdims=True)
    q_sd = jnp.std(qc, axis=1, keepdims=True) + 1e-6
    r_mu = jnp.mean(rc, axis=1)[None, :]
    r_sd = jnp.std(rc, axis=1)[None, :] + 1e-6
    return 0.5 * ((raw - q_mu) / q_sd + (raw - r_mu) / r_sd)
