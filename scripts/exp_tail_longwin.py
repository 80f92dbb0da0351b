#!/usr/bin/env python
"""60 s tail probe, round 5: does MORE AUDIO PER DECISION separate the
near-collided true pairs (seeds 2002/2010) from drifting true singles?

Round 4 measured that no statistic over the 2 s grid windows separates
them (scripts/exp_tail_bisect.py): the oracle window accuracy is 1.000 —
the embedding GEOMETRY separates the voices — but every truth-free
bisection statistic (alternation search, split stability) overlaps between
pairs and singles at ~70 windows / 5-10 segments per cluster.  The closing
line of that probe named the untried axis: "more audio per decision".

This probe re-embeds each cluster's own audio at LONG windows: member
segments are concatenated time-sorted, sliced into ``--long-win`` s
windows at ``--long-hop`` s, and embedded with the production encoder.
Longer windows average out within-speaker drift (the attractor that hides
the pair split), so if the hypothesis is right the bisection of the
long-window embeddings should show

  * pairs:   low sub-centroid cosine + high per-segment side alternation;
  * singles: high sub-cos (no split attempted) or low alternation (veto).

**MEASURED 2026-08-21 — NEGATIVE.**  4 s windows over the cluster's
concatenated audio do NOT separate pairs from singles: pair sub-centroid
cosines (0.895/0.908/0.967 for seeds 2002/2000/2010) sit INSIDE the
single band (0.831-0.988), long-window alternation (0.33-0.42) matches
the singles, and the truth-scored long-window split accuracy is only
0.84-0.86 (vs the 2 s oracle's 1.000) — windows spanning segment joins
mix speakers, and the near-collided pairs genuinely converge at longer
scales (averaging out drift also averages out what little inter-speaker
contrast the 2 s windows had).  This closes VERDICT r4 #5's
inference-side lever with data; the tail axis is encoder margin
(chip_queue13 stage 7) only.

Scored against per-segment truth from the dumps.  Inputs:
scripts/dump_cluster_inputs.py --dur 60 --seed {...} --out /tmp/tail_S.npz
(the dumps now carry the raw waveform).

    python scripts/exp_tail_longwin.py --seeds 2000 2001 2002 2005 2010
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SR = 16000


def cluster_kind(member: np.ndarray, truth: np.ndarray,
                 dur: np.ndarray) -> str:
    """'pair' if >=2 truth speakers each own >=25% of the cluster's speech."""
    lab = truth[member]
    d = dur[member]
    tot = d.sum()
    shares = []
    for u in np.unique(lab[lab >= 0]):
        shares.append(d[lab == u].sum() / max(tot, 1e-9))
    big = sum(1 for s in shares if s >= 0.25)
    return "pair" if big >= 2 else "single"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[2000, 2001, 2002, 2004, 2005, 2010])
    ap.add_argument("--long-win", type=float, default=4.0)
    ap.add_argument("--long-hop", type=float, default=1.0)
    ap.add_argument("--dumps", default="/tmp/tail_{seed}.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_diarization_tpu.cluster import spectral as sp
    from speech_diarization_tpu.train.recipes import load_speaker_encoder
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE))
    enc = jax.jit(lambda w: model.encode_batch(params, w))

    L = int(args.long_win * SR)
    H = int(args.long_hop * SR)

    rows = []
    for seed in args.seeds:
        path = Path(args.dumps.format(seed=seed))
        if not path.exists():
            print(f"[{seed}] dump missing: {path}", file=sys.stderr)
            continue
        d = np.load(path)
        wave = d["wave"]
        seg_s, seg_e = d["seg_starts"], d["seg_ends"]
        truth = d["seg_truth"]
        seg_embs = d["seg_embs"]
        durs = seg_e - seg_s
        labels = sp.spectral_cluster(seg_embs, min_speakers=1, max_speakers=8)

        win_embs, starts_s = d["win_embs"], d["starts_s"]
        win_s = float(d["grid_win_s"])
        e2 = win_embs / (np.linalg.norm(win_embs, axis=1, keepdims=True)
                         + 1e-9)
        # fully-inside 2 s window membership (as refine_labels_by_windows)
        order = np.argsort(seg_s)
        pos = np.searchsorted(seg_s[order], starts_s, side="right") - 1
        cand = order[np.clip(pos, 0, None)]
        inside = (pos >= 0) & (starts_s + win_s <= seg_e[cand] + 1e-9)
        seg_of_win = np.full(len(starts_s), -1, np.int64)
        seg_of_win[inside] = cand[inside]

        for c in range(int(labels.max()) + 1):
            member = np.where(labels == c)[0]
            if len(member) < 2:
                continue
            kind = cluster_kind(member, truth, durs)

            # --- current statistic: 2 s fully-inside grid windows --------
            widx = np.where(np.isin(seg_of_win, member))[0]
            sub2 = float("nan")
            if len(widx) >= 6:
                sub2, _ = sp.bisect_windows(e2[widx])

            # --- long windows over the cluster's own concatenated audio --
            msort = member[np.argsort(seg_s[member])]
            pieces, owner = [], []
            for s in msort:
                a, b = int(seg_s[s] * SR), int(seg_e[s] * SR)
                pieces.append(wave[a:b])
                owner.append(np.full(b - a, s, np.int64))
            cat = np.concatenate(pieces)
            own = np.concatenate(owner)
            n_w = max(0, (len(cat) - L) // H + 1)
            if n_w < 4:
                rows.append((seed, c, kind, len(member), sub2,
                             float("nan"), float("nan"), float("nan")))
                continue
            st = np.arange(n_w) * H
            crops = np.stack([cat[i:i + L] for i in st])
            embs = np.asarray(enc(jnp.asarray(crops)))
            eL = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-9)
            subL, sideL = sp.bisect_windows(eL)
            # map each long window to its center-sample owner segment
            w_owner = own[st + L // 2]
            # per-segment side by majority of its windows
            seg_side, purs = {}, []
            for s in msort:
                sw = sideL[w_owner == s]
                if sw.size:
                    seg_side[s] = sw.mean() >= 0.5
                    purs.append(max(sw.mean(), 1.0 - sw.mean()))
            ss = [seg_side[s] for s in msort if s in seg_side]
            alt = (float(np.mean([a != b for a, b in zip(ss[1:], ss[:-1])]))
                   if len(ss) > 1 else float("nan"))
            pur = float(np.mean(purs)) if purs else float("nan")
            # truth-scored long-window split quality (diagnostic only)
            t_of_w = truth[w_owner]
            acc = float("nan")
            if kind == "pair":
                uniq = np.unique(t_of_w[t_of_w >= 0])
                if len(uniq) >= 2:
                    m = np.isin(t_of_w, uniq[:2])
                    tw = t_of_w[m] == uniq[0]
                    agree = (sideL[m] == tw).mean()
                    acc = float(max(agree, 1.0 - agree))
            rows.append((seed, c, kind, len(member), sub2, subL, alt, pur,
                         acc))

    print(f"\n{'seed':>5} {'cl':>3} {'kind':>6} {'nseg':>4} "
          f"{'sub2':>6} {'subL':>6} {'altL':>6} {'purL':>6} {'accL':>6}")
    for r in rows:
        r = list(r) + [float("nan")] * (9 - len(r))
        print(f"{r[0]:>5} {r[1]:>3} {r[2]:>6} {r[3]:>4} "
              f"{r[4]:>6.3f} {r[5]:>6.3f} {r[6]:>6.3f} {r[7]:>6.3f} "
              f"{r[8]:>6.3f}")


if __name__ == "__main__":
    main()
