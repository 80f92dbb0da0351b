"""L2b — clustering and score normalization.

On-device default: cosine affinity (one MXU matmul) → refined normalized
Laplacian → ``jnp.linalg.eigh`` → eigengap speaker-count estimate → masked
k-means on spectral embeddings.  Host escape hatches (AHC via scipy linkage,
HDBSCAN via sklearn) preserve reference parity (SURVEY.md §7.4 item 2).

Replaces: ``cluster_hdbscan``/``cluster_hdbscan_two_stage``
(``anti_stick_diarize.py:175-270``), ``cluster_embeddings``/whitening/AS-Norm
(``diar_diag.py:187-229``), pyannote agglomerative clustering with
min/max speakers (``diarization_baseline.py:176-181``).
"""
from .affinity import l2_normalize, cosine_affinity, whiten, asnorm_scores
from .kmeans import kmeans, farthest_point_init
from .spectral import (
    spectral_cluster, estimate_num_speakers, refine_labels_by_windows,
)
from .ahc import ahc_cluster
from .density import hdbscan_cleaned, hdbscan_cluster, hdbscan_two_stage

__all__ = [
    "l2_normalize",
    "cosine_affinity",
    "whiten",
    "asnorm_scores",
    "kmeans",
    "farthest_point_init",
    "spectral_cluster",
    "refine_labels_by_windows",
    "estimate_num_speakers",
    "ahc_cluster",
    "hdbscan_cleaned",
    "hdbscan_cluster",
    "hdbscan_two_stage",
    "cluster_embeddings",
]


def cluster_embeddings(embs, method: str = "spectral", **kwargs):
    """Dispatcher mirroring ``diar_diag.cluster_embeddings`` (``diar_diag.py:213-229``)
    plus the spectral default and two-stage HDBSCAN variants."""
    import numpy as np

    embs = np.asarray(embs)
    if method == "spectral":
        return np.asarray(spectral_cluster(embs, **kwargs))
    if method == "ahc":
        return ahc_cluster(embs, **kwargs)
    if method == "hdbscan":
        return hdbscan_cluster(embs, **kwargs)
    if method == "hdbscan2":
        return hdbscan_two_stage(embs, **kwargs)
    raise ValueError(f"unknown clustering method: {method}")
