#!/usr/bin/env python
"""Offline clustering A/B on dumped pipeline cluster inputs
(scripts/dump_cluster_inputs.py): scores k and duration-weighted
segment-label accuracy for affinity/membership variants.

Built for the 2026-08-19 regression: sharpened weighted affinity fixed the
60 s seed-0 merge (33% -> 7.9%) but broke the 600 s bench file
(0.55% -> 10.1% DER, k=3 both) — membership confusion in the weighted
spectral embedding.  Variants probe where the membership is lost.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from scripts.exp_spectral_sharpen import binarized  # noqa: E402


def spectral(embs, aff_fn, max_k=8, min_k=1):
    from scipy.linalg import eigh as scipy_eigh

    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    aff = e @ e.T
    n = len(aff)
    a = aff_fn(aff.copy())
    np.fill_diagonal(a, 1.0)
    a = 0.5 * (a + a.T)
    deg = a.sum(1)
    dsq = 1 / np.sqrt(np.maximum(deg, 1e-8))
    lap = np.eye(n) - dsq[:, None] * a * dsq[None, :]
    kmax = min(max_k, n - 1)
    ev, vecs = scipy_eigh(lap, subset_by_index=[0, kmax])
    idx = np.arange(1, kmax + 1)
    gaps = np.where((idx >= min_k) & (idx <= max_k), ev[1:] - ev[:-1], -np.inf)
    k = int(np.argmax(gaps)) + 1
    spec = vecs[:, :k]
    spec = spec / (np.linalg.norm(spec, axis=1, keepdims=True) + 1e-9)
    labels = lloyd(spec, k)
    return labels, k, e


def lloyd(x, k, iters=25):
    n = len(x)
    centers = np.zeros((k, x.shape[1]))
    centers[0] = x[np.argmin(((x - x.mean(0)) ** 2).sum(1))]
    mind = np.full(n, np.inf)
    for i in range(1, k):
        mind = np.minimum(mind, ((x - centers[i - 1]) ** 2).sum(1))
        centers[i] = x[np.argmax(mind)]
    lab = None
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        lab = d.argmin(1)
        for j in range(k):
            if (lab == j).any():
                centers[j] = x[lab == j].mean(0)
            else:
                # re-seed an emptied cluster to the point farthest from its
                # assigned center (ADVICE r2: a stale center silently
                # returns < k distinct labels)
                far = d[np.arange(n), lab].argmax()
                centers[j] = x[far]
    return lab


def cos_kmeans_refine(e, labels, k, dur, iters=10):
    """Cosine k-means in ORIGINAL embedding space seeded by spectral labels,
    duration-weighted centroids."""
    lab = labels.copy()
    for _ in range(iters):
        cents = np.zeros((k, e.shape[1]))
        for j in range(k):
            sel = lab == j
            if sel.any():
                cents[j] = (e[sel] * dur[sel, None]).sum(0)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-9
        new = (e @ cents.T).argmax(1)
        if (new == lab).all():
            break
        lab = new
    return lab


def wacc(labels, truth, dur):
    from scipy.optimize import linear_sum_assignment

    keep = truth >= 0  # pure-false-alarm segments carry -1 (ADVICE r2)
    labels, truth, dur = labels[keep], truth[keep], dur[keep]
    m = max(labels.max(), truth.max()) + 1
    conf = np.zeros((m, m))
    for a, b, w in zip(labels, truth, dur):
        conf[a, b] += w
    r, c = linear_sum_assignment(-conf)
    return conf[r, c].sum() / dur.sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/cluster600.npz")
    args = ap.parse_args()
    z = np.load(args.npz)
    embs = z["seg_embs"].astype(np.float64)
    truth = z["seg_truth"]
    dur = (z["seg_ends"] - z["seg_starts"]).astype(np.float64)

    variants = {
        "binarized": binarized,
        "relu^3": lambda a: np.maximum(a, 0) ** 3 + 1e-4,
        "relu^5": lambda a: np.maximum(a, 0) ** 5 + 1e-4,
        "relu^7": lambda a: np.maximum(a, 0) ** 7 + 1e-4,
    }
    for name, fn in variants.items():
        labels, k, e = spectral(embs, fn)
        a0 = wacc(labels, truth, dur)
        ref = cos_kmeans_refine(e, labels, max(k, labels.max() + 1), dur)
        a1 = wacc(ref, truth, dur)
        print(f"{name:12s} k={k} acc={a0:.4f} +cos-refine={a1:.4f}")

    # the PRODUCTION algorithm, including pad-to-64 cyclic rows and zero
    # sample weights (ADVICE r2: the unpadded float64 variants above can
    # misattribute a padding-caused failure to bf16/chip)
    from speech_diarization_tpu.cluster.spectral import _spectral_labels_np

    e32 = embs.astype(np.float32)
    n = len(e32)
    n_pad = max(64, int(np.ceil(n / 64)) * 64)
    idx = np.arange(n_pad) % n
    w = (np.arange(n_pad) < n).astype(np.float32)
    lab = _spectral_labels_np(e32[idx], w, 1, 8)[:n]
    print(f"{'production':12s} k={lab.max() + 1} "
          f"acc={wacc(lab, truth, dur):.4f} (padded+weighted)")


if __name__ == "__main__":
    main()
