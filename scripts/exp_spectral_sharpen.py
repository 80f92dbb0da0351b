#!/usr/bin/env python
"""Offline A/B: binarized-threshold spectral candidate vs p-power-sharpened
weighted affinity.

Motivation (2026-08-19): under the robust encoder, near-collided in-domain
speaker pairs sit at cross-cos ~0.6 while within-speaker mass is 0.8+; the
two-means binarization keeps BOTH above tau (~0.18) and the eigengap merges
the pair (bench seed-0: 2/3 speakers, 33% DER).  A weighted affinity
sharpened as max(aff,0)^p preserves the within/cross-near contrast
(relu^3/^5 find k=3 on the same matrix).  This experiment scores both on:

  * the bench seed-0 robust-encoder segment embeddings (merged case)
  * the 1,435-segment 1-hr regression asset (the bridge-thinning case the
    two-candidate design was built for)
  * heavy-tail in-domain seeds 2000-2005 (truth-segment embeddings, robust)
  * held-out LPC domain files (dry + reverb)

Usage: python scripts/exp_spectral_sharpen.py [--p 3 5] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def cluster_with(aff_fn, embs, min_k=1, max_k=8):
    from scipy.linalg import eigh as scipy_eigh

    embs = np.asarray(embs, np.float64)
    e = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
    aff = e @ e.T
    n = len(aff)
    a = aff_fn(aff)
    np.fill_diagonal(a, 1.0)
    a = 0.5 * (a + a.T)
    deg = a.sum(1)
    dsq = 1 / np.sqrt(np.maximum(deg, 1e-8))
    lap = np.eye(n) - dsq[:, None] * a * dsq[None, :]
    kmax = min(max_k, n - 1)
    ev, vecs = scipy_eigh(lap, subset_by_index=[0, kmax])
    idx = np.arange(1, kmax + 1)
    gaps = np.where((idx >= min_k) & (idx <= max_k),
                    ev[1:kmax + 1] - ev[:kmax], -np.inf)
    k = int(np.argmax(gaps)) + 1
    spec = vecs[:, :k]
    spec = spec / (np.linalg.norm(spec, axis=1, keepdims=True) + 1e-9)
    # same farthest-point + lloyd as production
    centers = np.zeros((k, spec.shape[1]))
    centers[0] = spec[np.argmin(((spec - spec.mean(0)) ** 2).sum(1))]
    mind = np.full(n, np.inf)
    for i in range(1, k):
        mind = np.minimum(mind, ((spec - centers[i - 1]) ** 2).sum(1))
        centers[i] = spec[np.argmax(mind)]
    for _ in range(25):
        d = ((spec[:, None] - centers[None]) ** 2).sum(-1)
        lab = d.argmin(1)
        for j in range(k):
            if (lab == j).any():
                centers[j] = spec[lab == j].mean(0)
    return d.argmin(1), k


def binarized(aff):
    n = len(aff)
    sims = aff[~np.eye(n, dtype=bool)]
    c = np.array([sims.min(), sims.max()], np.float64)
    for _ in range(25):
        a0 = np.abs(sims - c[0]) <= np.abs(sims - c[1])
        if a0.any():
            c[0] = sims[a0].mean()
        if (~a0).any():
            c[1] = sims[~a0].mean()
    tau = 0.5 * (c[0] + c[1])
    if c[1] - c[0] >= 0.15:
        return (aff >= tau).astype(np.float64)
    m = int(np.clip(round(0.7 * n), 2, n))
    thr = np.partition(aff, n - m, axis=1)[:, n - m : n - m + 1]
    return (aff >= thr).astype(np.float64)


def acc(labels, truth):
    """Best-mapping label accuracy (Hungarian on the confusion matrix)."""
    from scipy.optimize import linear_sum_assignment

    labels, truth = np.asarray(labels), np.asarray(truth)
    nl, nt = labels.max() + 1, truth.max() + 1
    m = max(nl, nt)
    conf = np.zeros((m, m))
    for a, b in zip(labels, truth):
        conf[a, b] += 1
    r, c = linear_sum_assignment(-conf)
    return conf[r, c].sum() / len(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=float, nargs="+", default=[3.0, 5.0])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_diarization_tpu.segment.embed import (
        embed_windows, segment_embeddings_from_grid, window_starts,
    )
    from speech_diarization_tpu.train.recipes import load_speaker_encoder
    from speech_diarization_tpu.types import SegmentArray
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE))
    enc = jax.jit(lambda w: model.encode_batch(params, w))

    def truth_seg_embs(wave, s, e, k):
        y = np.asarray(wave, np.float32)
        win_embs = np.asarray(embed_windows(enc, jnp.asarray(y), 16000, 1.0, 0.1))
        gs = window_starts(len(y), 16000, 1.0, 0.1) / 16000
        segs = SegmentArray(np.asarray(s), np.asarray(e), np.asarray(k))
        return np.asarray(
            segment_embeddings_from_grid(win_embs, gs, 1.0, segs))

    cases = []
    # 1. bench seed-0 pipeline embeddings (if the dump exists)
    dump = Path("/tmp/seed0_embs.npy")
    if dump.exists():
        cases.append(("seed0-pipeline", np.load(dump), None, 3))
    # 2. 1-hr asset: truth is 3 speakers (labels unknown -> k only)
    z = np.load(ROOT / "tests/data/segembs_1hr_3spk.npz")
    cases.append(("1hr-asset", z["embs"], None, 3))
    # 3. heavy-tail in-domain seeds
    from speech_diarization_tpu.train.synthetic import make_conversation

    for seed in range(2000, 2006):
        wave, (s, e, k) = make_conversation(
            np.random.default_rng(seed), 60.0, n_speakers=3, sr=16000)
        cases.append((f"indomain-{seed}", truth_seg_embs(wave, s, e, k),
                      np.asarray(k), 3))
    # 4. held-out domains
    from speech_diarization_tpu.train.heldout import make_conversation_heldout

    for seed in (1000, 1001):
        wave, truth = make_conversation_heldout(
            np.random.default_rng(seed), 60.0, n_speakers=3, sr=16000)
        s, e, k = truth
        cases.append((f"heldout-{seed}", truth_seg_embs(wave, s, e, k),
                      np.asarray(k), 3))

    variants = [("binarized", binarized)]
    for p in args.p:
        variants.append((f"relu^{p:g}",
                         lambda a, p=p: np.maximum(a, 0.0) ** p))
    header = f"{'case':18s}" + "".join(f"{name:>18s}" for name, _ in variants)
    print(header)
    for cname, embs, truth, ktrue in cases:
        row = f"{cname:18s}"
        for vname, fn in variants:
            labels, k = cluster_with(fn, embs)
            cell = f"k={k}"
            if truth is not None:
                cell += f" acc={acc(labels, truth):.3f}"
            mark = "*" if k == ktrue else " "
            row += f"{cell + mark:>18s}"
        print(row)


if __name__ == "__main__":
    main()
