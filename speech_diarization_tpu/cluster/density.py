"""Density-based clustering (HDBSCAN) — host escape hatch + two-stage variant.

The reference's flagship pipeline clusters with HDBSCAN
(``anti_stick_diarize.py:175-186``) and a two-stage over-cluster→centroid→
re-cluster scheme (``anti_stick_diarize.py:189-270``); the diagnostic pipeline
uses ``HDBSCAN(min_cluster_size=6, min_samples=3, metric='precomputed')``
(``diar_diag.py:213-217``).  We back these with ``sklearn.cluster.HDBSCAN``
(a C-accelerated host implementation already in the image) — the DER-parity
escape hatch of SURVEY.md §7.4 item 2 — while the on-device default remains
spectral clustering.

Two-stage semantics: stage 1 must OVER-cluster (many pure micro-clusters),
which requires ``cluster_selection_method='leaf'`` — the default excess-of-
mass selection happily returns 1–2 macro clusters that already mix speakers,
which is what made the original port score 37.8% DER on the synthetic
harness.  Stage 2 merges micro-centroids by cosine threshold (average-linkage
agglomerative), the "centroid re-cluster" step.  Noise is reassigned to the
nearest micro-centroid rather than dropped: unlabeled speech is a guaranteed
miss for DER, and the reference pipeline itself routes leftovers through
frame reassignment anyway.

Single-stage ``hdbscan_cluster`` keeps the reference's exact semantics
(noise stays -1, EOM selection, allow_single_cluster).
"""
from __future__ import annotations

import numpy as np


def _sk_hdbscan(**kwargs):
    from sklearn.cluster import HDBSCAN

    return HDBSCAN(**kwargs)


def _normalize(embs: np.ndarray) -> np.ndarray:
    embs = np.asarray(embs, dtype=np.float64)
    return embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)


def hdbscan_cluster(
    embs: np.ndarray,
    min_cluster_size: int = 2,
    min_samples: int | None = None,
    precomputed_cosine: bool = True,
    allow_single_cluster: bool = True,
    cluster_selection_method: str = "eom",
) -> np.ndarray:
    """Single-stage HDBSCAN over cosine distances
    (``cluster_hdbscan``, ``anti_stick_diarize.py:175-186``)."""
    embs = np.asarray(embs, dtype=np.float64)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    if n < max(2, min_cluster_size):
        return np.zeros((n,), dtype=np.int32)
    e = _normalize(embs)
    if precomputed_cosine:
        d = np.clip(1.0 - e @ e.T, 0.0, None)
        np.fill_diagonal(d, 0.0)
        clu = _sk_hdbscan(
            min_cluster_size=min_cluster_size,
            min_samples=min_samples,
            metric="precomputed",
            allow_single_cluster=allow_single_cluster,
            cluster_selection_method=cluster_selection_method,
        )
        return clu.fit_predict(d).astype(np.int32)
    clu = _sk_hdbscan(
        min_cluster_size=min_cluster_size,
        min_samples=min_samples,
        metric="euclidean",
        allow_single_cluster=allow_single_cluster,
        cluster_selection_method=cluster_selection_method,
    )
    return clu.fit_predict(e).astype(np.int32)


def _merge_centroids_by_threshold(
    centroids: np.ndarray, cos_threshold: float
) -> np.ndarray:
    """Average-linkage agglomerative merge of unit centroids at cosine
    similarity >= ``cos_threshold``.  Robust down to 2 centroids (where
    density estimation is meaningless)."""
    m = centroids.shape[0]
    if m <= 1:
        return np.zeros(m, dtype=np.int32)
    from scipy.cluster.hierarchy import fcluster, linkage
    from scipy.spatial.distance import squareform

    d = np.clip(1.0 - centroids @ centroids.T, 0.0, None)
    np.fill_diagonal(d, 0.0)
    z = linkage(squareform(d, checks=False), method="average")
    labels = fcluster(z, t=1.0 - cos_threshold, criterion="distance") - 1
    return labels.astype(np.int32)


def hdbscan_cleaned(
    embs: np.ndarray,
    min_cluster_size: int = 2,
    centroid_cos_threshold: float = 0.70,
) -> np.ndarray:
    """Single-stage density clustering with the cleanup the pipeline needs
    for DER: leaf selection (EOM on tens of points both merges and splits
    speakers), noise kept as singleton clusters, then a centroid threshold
    merge.  ``hdbscan_cluster`` above stays reference-faithful (EOM,
    noise=-1) for parity experiments."""
    embs = np.asarray(embs, dtype=np.float64)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    if n <= 2:
        return np.zeros(n, dtype=np.int32)
    e = _normalize(embs)
    stage1 = hdbscan_cluster(
        e, min_cluster_size=min_cluster_size, precomputed_cosine=True,
        allow_single_cluster=False, cluster_selection_method="leaf",
    )
    n_c = int(stage1.max()) + 1
    stage1 = stage1.copy()
    noise = np.flatnonzero(stage1 < 0)
    stage1[noise] = n_c + np.arange(len(noise), dtype=np.int32)
    n_c += len(noise)
    if n_c < 1:
        stage1 = np.arange(n, dtype=np.int32)
        n_c = n
    centroids = _normalize(
        np.stack([e[stage1 == i].mean(axis=0) for i in range(n_c)])
    )
    merged = _merge_centroids_by_threshold(centroids, centroid_cos_threshold)
    return merged[stage1].astype(np.int32)


def hdbscan_two_stage(
    embs: np.ndarray,
    min_cluster_size: int = 2,
    centroid_cos_threshold: float = 0.70,
) -> np.ndarray:
    """Two-stage anti-stick clustering (``cluster_hdbscan_two_stage``,
    ``anti_stick_diarize.py:189-270``): over-cluster L2-normalized embeddings
    into micro-clusters (leaf-selection HDBSCAN), average each micro-cluster
    into a unit centroid, merge centroids at ``centroid_cos_threshold``
    cosine similarity, and propagate the merged label back to every member.

    ``min_cluster_size`` is N-aware: clamped to keep at least ~4 micro-
    clusters possible so small files (few segments) don't collapse to one.
    """
    embs = np.asarray(embs, dtype=np.float64)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    if n <= 2:
        return np.zeros(n, dtype=np.int32)
    e = _normalize(embs)

    mcs = int(np.clip(min_cluster_size, 2, max(2, n // 4)))
    stage1 = hdbscan_cluster(
        e, min_cluster_size=mcs, precomputed_cosine=False,
        allow_single_cluster=False, cluster_selection_method="leaf",
    )
    n_micro = int(stage1.max()) + 1

    # Noise points become singleton micro-clusters: a speaker with fewer
    # than min_cluster_size segments can never form a micro-cluster, and
    # folding it into the nearest foreign centroid is guaranteed confusion.
    # The centroid threshold-merge below decides whether each singleton
    # joins an existing speaker or stands alone.
    stage1 = stage1.copy()
    noise = np.flatnonzero(stage1 < 0)
    stage1[noise] = n_micro + np.arange(len(noise), dtype=np.int32)
    n_micro += len(noise)
    if n_micro < 1:
        stage1 = np.arange(n, dtype=np.int32)
        n_micro = n

    centroids = np.stack([e[stage1 == i].mean(axis=0) for i in range(n_micro)])
    centroids = _normalize(centroids)
    stage2 = _merge_centroids_by_threshold(centroids, centroid_cos_threshold)
    return stage2[stage1].astype(np.int32)
