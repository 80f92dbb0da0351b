"""Density-based clustering (HDBSCAN) — host escape hatch + two-stage variant.

The reference's flagship pipeline clusters with HDBSCAN
(``anti_stick_diarize.py:175-186``) and a two-stage over-cluster→centroid→
re-cluster scheme (``anti_stick_diarize.py:189-270``); the diagnostic pipeline
uses ``HDBSCAN(min_cluster_size=6, min_samples=3, metric='precomputed')``
(``diar_diag.py:213-217``).  We back these with ``sklearn.cluster.HDBSCAN``
(a C-accelerated host implementation already in the image) — the DER-parity
escape hatch of SURVEY.md §7.4 item 2 — while the on-device default remains
spectral clustering.

Noise policy matches the reference: label -1 marks low-density segments;
pipelines later fall back to "single speaker" when everything is noise
(``diar_diag.py:375-377``).
"""
from __future__ import annotations

import numpy as np


def _sk_hdbscan(**kwargs):
    from sklearn.cluster import HDBSCAN

    return HDBSCAN(**kwargs)


def hdbscan_cluster(
    embs: np.ndarray,
    min_cluster_size: int = 2,
    min_samples: int | None = None,
    precomputed_cosine: bool = True,
    allow_single_cluster: bool = True,
) -> np.ndarray:
    """Single-stage HDBSCAN over cosine distances
    (``cluster_hdbscan``, ``anti_stick_diarize.py:175-186``)."""
    embs = np.asarray(embs, dtype=np.float64)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    if n < max(2, min_cluster_size):
        return np.zeros((n,), dtype=np.int32)
    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    if precomputed_cosine:
        d = np.clip(1.0 - e @ e.T, 0.0, None)
        np.fill_diagonal(d, 0.0)
        clu = _sk_hdbscan(
            min_cluster_size=min_cluster_size,
            min_samples=min_samples,
            metric="precomputed",
            allow_single_cluster=allow_single_cluster,
        )
        return clu.fit_predict(d).astype(np.int32)
    clu = _sk_hdbscan(
        min_cluster_size=min_cluster_size,
        min_samples=min_samples,
        metric="euclidean",
        allow_single_cluster=allow_single_cluster,
    )
    return clu.fit_predict(e).astype(np.int32)


def hdbscan_two_stage(
    embs: np.ndarray,
    min_cluster_size: int = 2,
) -> np.ndarray:
    """Two-stage anti-stick clustering (``cluster_hdbscan_two_stage``,
    ``anti_stick_diarize.py:189-270``): over-cluster L2-normalized embeddings
    into micro-clusters (euclidean HDBSCAN), average each micro-cluster into a
    centroid, re-cluster the centroids, and propagate the stage-2 label back
    to every member segment.  Noise stays -1 at both stages."""
    embs = np.asarray(embs, dtype=np.float64)
    n = embs.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)

    stage1 = hdbscan_cluster(
        embs, min_cluster_size=min_cluster_size, precomputed_cosine=False
    )
    n_micro = int(stage1.max()) + 1
    if n_micro < 1:
        return np.zeros(n, dtype=np.int32)

    centroids = np.stack([embs[stage1 == i].mean(axis=0) for i in range(n_micro)])

    if len(centroids) < min_cluster_size:
        stage2 = np.zeros(len(centroids), dtype=np.int32)
    else:
        stage2 = hdbscan_cluster(
            centroids, min_cluster_size=min_cluster_size, precomputed_cosine=False
        )

    final = np.full(n, -1, dtype=np.int32)
    for micro, lab in enumerate(stage2):
        if lab != -1:
            final[stage1 == micro] = lab
    return final
