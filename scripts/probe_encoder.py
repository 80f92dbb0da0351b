#!/usr/bin/env python
"""Direct speaker-embedding quality probe on UNSEEN speakers.

Isolates encoder generalization from the rest of the pipeline: renders
utterances for fresh speaker profiles (never in any training bank) through a
chosen synthesis family + acoustic channel, embeds them through the
streaming grid path (the production regime), and reports

  * within- / across-speaker cosine statistics and their separation,
  * a greedy-centroid clustering purity at the true K,
  * EER of the pairwise verification trial.

Usage:
  python scripts/probe_encoder.py --enc weights/ecapa_mc_full_stream.npz \
      --family lpc --channel on --speakers 12 --utts 8 [--cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", type=str,
                    default="weights/ecapa_synthetic_full_stream.npz")
    ap.add_argument("--family", choices=["lpc", "harm", "mixed"],
                    default="mixed")
    ap.add_argument("--channel", choices=["on", "off"], default="off")
    ap.add_argument("--speakers", type=int, default=12)
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--dur", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.train.multicond import (
        ChannelBank, render_speaker,
    )
    from speech_diarization_tpu.train.recipes import load_speaker_encoder
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)
    model, params = load_speaker_encoder(args.enc)
    sr = model.sample_rate
    rng = np.random.default_rng(args.seed)
    channels = ChannelBank(rng) if args.channel == "on" else None

    # fresh profiles on a fine grid — deliberately NOT any bank's layout
    profs = [{"f0": float(rng.uniform(85.0, 290.0)),
              "shift": float(rng.uniform(0.84, 1.24))}
             for _ in range(args.speakers)]

    n = int(args.dur * sr)
    wavs, labels = [], []
    for k, prof in enumerate(profs):
        for _ in range(args.utts):
            family = (args.family if args.family != "mixed"
                      else ("lpc" if rng.uniform() < 0.5 else "harm"))
            w = render_speaker(rng, prof, args.dur, sr, family=family)
            if channels is not None:
                w = channels.apply(rng, w)
            w = np.pad(w[:n], (0, max(0, n - len(w)))).astype(np.float32)
            wavs.append(w)
            labels.append(k)
    wavs = np.stack(wavs)
    labels = np.asarray(labels)

    # streaming-grid embedding (1 s windows / 0.5 s hop), mean-pooled per utt
    win, hop = sr, sr // 2
    n_win = (n - win) // hop + 1
    embed = jax.jit(jax.vmap(
        lambda y: model.encode_grid_chunk(params, y, n_win, 0, win, hop)))
    embs = np.asarray(embed(jnp.asarray(wavs))).mean(axis=1)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True) + 1e-9

    sim = embs @ embs.T
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(labels), 1)
    within = sim[iu][same[iu]]
    across = sim[iu][~same[iu]]

    # EER over the verification trial
    scores = sim[iu]
    truth = same[iu]
    order = np.argsort(-scores)
    t = truth[order]
    fn = np.cumsum(~t[::-1])[::-1]  # not used; compute properly below
    pos = truth.sum()
    neg = len(truth) - pos
    fnr = 1.0 - np.cumsum(t) / pos
    fpr = np.cumsum(~t) / neg
    eer = float(fpr[np.argmin(np.abs(fnr - fpr))])

    # greedy centroid purity at true K (kmeans-lite, cosine)
    centroids = embs[[np.flatnonzero(labels == k)[0] for k in range(args.speakers)]]
    for _ in range(10):
        a = np.argmax(embs @ centroids.T, axis=1)
        centroids = np.stack([
            embs[a == k].mean(0) if (a == k).any() else centroids[k]
            for k in range(args.speakers)])
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-9
    purity = float((a == labels).mean())

    out = {
        "enc": Path(args.enc).name,
        "family": args.family,
        "channel": args.channel,
        "within_mean": round(float(within.mean()), 4),
        "within_p10": round(float(np.percentile(within, 10)), 4),
        "across_mean": round(float(across.mean()), 4),
        "across_p90": round(float(np.percentile(across, 90)), 4),
        "separation": round(float(within.mean() - across.mean()), 4),
        "eer": round(eer, 4),
        "purity_at_true_k": round(purity, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
