"""Spectral clustering with eigengap speaker-count estimation — on device.

The TPU-native default replacing host HDBSCAN/agglomerative clustering
(SURVEY.md §7.4 item 2): cosine affinity (MXU matmul) → row-wise p-percentile
refinement (Wang et al., "Speaker diarization with LSTM") → symmetric
normalized Laplacian → ``jnp.linalg.eigh`` → eigengap → masked k-means over
the spectral embedding.  Everything is static-shaped; the traced speaker count
only gates centroid masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .affinity import cosine_affinity, l2_normalize
from .kmeans import kmeans


def refine_affinity(aff: jax.Array, p_percentile: float = 0.90) -> jax.Array:
    """Row-wise soft-threshold at the p-th percentile, then symmetrize.
    Off-row-top values are attenuated (×0.01) rather than zeroed, and the
    diagonal is set to the row max — the standard refinement chain."""
    n = aff.shape[0]
    eye = jnp.eye(n, dtype=bool)
    a = jnp.where(eye, -jnp.inf, aff)
    row_max = jnp.max(a, axis=1, keepdims=True)
    a = jnp.where(eye, row_max, aff)
    thresh = jnp.percentile(a, p_percentile * 100.0, axis=1, keepdims=True)
    a = jnp.where(a >= thresh, a, a * 0.01)
    return 0.5 * (a + a.T)


def estimate_num_speakers(
    eigvals: jax.Array, min_speakers: int, max_speakers: int
) -> jax.Array:
    """Eigengap heuristic on ascending normalized-Laplacian eigenvalues:
    k = argmax of lambda_{i+1} - lambda_i over the allowed range."""
    kmax = min(max_speakers, eigvals.shape[0] - 1)
    gaps = eigvals[1 : kmax + 1] - eigvals[:kmax]  # gap i -> k = i+1 clusters
    idx = jnp.arange(1, kmax + 1)
    allowed = (idx >= min_speakers) & (idx <= max_speakers)
    gaps = jnp.where(allowed, gaps, -jnp.inf)
    return (jnp.argmax(gaps) + 1).astype(jnp.int32)


def _spectral_labels(
    embs: jax.Array,
    weights: jax.Array,
    min_speakers: int,
    max_speakers: int,
    p_percentile: float,
) -> jax.Array:
    aff = cosine_affinity(embs)
    aff = refine_affinity(aff, p_percentile)
    aff = jnp.clip(aff, 0.0)  # Laplacian needs nonnegative weights
    deg = jnp.sum(aff, axis=1)
    dsq = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-8))
    lap = jnp.eye(aff.shape[0]) - (dsq[:, None] * aff) * dsq[None, :]
    eigvals, eigvecs = jnp.linalg.eigh(lap)  # ascending
    k = estimate_num_speakers(eigvals, min_speakers, max_speakers)
    # static width, but columns >= k are zeroed (they oscillate *within*
    # clusters and would pollute k-means distances)
    spec = eigvecs[:, :max_speakers] * (jnp.arange(max_speakers) < k)[None, :]
    spec = l2_normalize(spec, eps=1e-9)
    labels, _ = kmeans(spec, k, k_max=max_speakers, sample_weight=weights)
    return labels


_spectral_jit = jax.jit(
    _spectral_labels,
    static_argnames=("min_speakers", "max_speakers", "p_percentile"),
)

def _device_capable() -> bool:
    """The device path needs percentile (sort) and eigh; on backends without
    those lowerings (axon) the numpy mirror serves — the affinity matrices
    are tiny (N = #segments), so this is never the bottleneck.  NOTE: this
    must be decided statically; a failed compile poisons the axon process."""
    from ..utils.backend import features

    f = features()
    return f.sort and f.eigh


def _spectral_labels_np(
    embs: np.ndarray, weights: np.ndarray, min_speakers: int,
    max_speakers: int, p_percentile: float,
) -> np.ndarray:
    """Host mirror of :func:`_spectral_labels` (same algorithm, numpy)."""
    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    aff = e @ e.T
    n = aff.shape[0]
    eye = np.eye(n, dtype=bool)
    a = np.where(eye, -np.inf, aff)
    row_max = a.max(axis=1, keepdims=True)
    a = np.where(eye, row_max, aff)
    thr = np.percentile(a, p_percentile * 100.0, axis=1, keepdims=True)
    a = np.where(a >= thr, a, a * 0.01)
    a = np.clip(0.5 * (a + a.T), 0.0, None)
    deg = a.sum(axis=1)
    dsq = 1.0 / np.sqrt(np.maximum(deg, 1e-8))
    lap = np.eye(n) - (dsq[:, None] * a) * dsq[None, :]
    eigvals, eigvecs = np.linalg.eigh(lap)
    kmax = min(max_speakers, n - 1)
    gaps = eigvals[1 : kmax + 1] - eigvals[:kmax]
    idx = np.arange(1, kmax + 1)
    gaps = np.where((idx >= min_speakers) & (idx <= max_speakers), gaps, -np.inf)
    k = int(np.argmax(gaps)) + 1
    spec = eigvecs[:, :k]
    spec = spec / (np.linalg.norm(spec, axis=1, keepdims=True) + 1e-9)
    # farthest-point init + lloyd
    centers = np.zeros((k, spec.shape[1]))
    centers[0] = spec[np.argmin(((spec - spec.mean(0)) ** 2).sum(1))]
    min_d = np.full(n, np.inf)
    for i in range(1, k):
        min_d = np.minimum(min_d, ((spec - centers[i - 1]) ** 2).sum(1))
        centers[i] = spec[np.argmax(min_d)]
    for _ in range(25):
        d = ((spec[:, None, :] - centers[None]) ** 2).sum(-1)
        labels = d.argmin(1)
        for j in range(k):
            sel = (labels == j) & (weights > 0)
            if sel.any():
                centers[j] = spec[sel].mean(0)
    d = ((spec[:, None, :] - centers[None]) ** 2).sum(-1)
    return d.argmin(1).astype(np.int32)


def spectral_cluster(
    embs,
    min_speakers: int = 1,
    max_speakers: int = 8,
    p_percentile: float = 0.90,
    pad_to: int = 64,
) -> np.ndarray:
    """Host-friendly wrapper: pads N up to a multiple of ``pad_to`` by
    cyclically repeating real rows (duplicated points join existing clusters
    and keep the eigen-structure stable) so jit recompiles only per size
    bucket.  Returns int labels [N] with 0..k-1."""
    embs = np.asarray(embs, dtype=np.float32)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    if n == 1:
        return np.zeros((1,), dtype=np.int32)
    if n <= max_speakers:
        # fewer points than the cluster bound: each point its own speaker
        # is meaningless; fall back to single-linkage-free trivial answer
        max_speakers = max(min(n - 1, max_speakers), 1)

    # keep at least ~4 unique neighbors per row after refinement: for short
    # files (few segments) a fixed 90th percentile would isolate every point
    p_percentile = round(min(p_percentile, max(0.0, 1.0 - 4.0 / n)), 2)

    n_pad = max(pad_to, int(np.ceil(n / pad_to)) * pad_to)
    idx = np.arange(n_pad) % n
    padded = embs[idx]
    weights = (np.arange(n_pad) < n).astype(np.float32)
    if _device_capable():
        labels = np.asarray(
            _spectral_jit(
                jnp.asarray(padded),
                jnp.asarray(weights),
                int(min_speakers),
                int(max_speakers),
                p_percentile,
            )
        )
    else:
        labels = _spectral_labels_np(
            padded, weights, int(min_speakers), int(max_speakers), p_percentile
        )
    labels = labels[:n]
    # relabel to contiguous 0..k-1 by first appearance
    uniq, first_pos = np.unique(labels, return_index=True)
    order = uniq[np.argsort(first_pos)]
    remap = {int(u): i for i, u in enumerate(order)}
    return np.array([remap[int(l)] for l in labels], dtype=np.int32)
