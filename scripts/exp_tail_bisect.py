#!/usr/bin/env python
"""60 s tail probe: can any inference-side bisection statistic separate the
near-collided TRUE PAIRS (seeds 2002/2010) from drifting TRUE SINGLES?

Measured 2026-08-20 (STATUS.md) — BOTH candidate statistics FAIL:

1. **Alternation-seeking search** (max temporal alternation over many
   bisection inits, subject to side-purity >= 0.995): singles with 5-8
   segments achieve spuriously high alternation (0.60-0.86 at purity
   1.000) because the search overfits the small segment count — the pair
   rows (alt 0.37-0.50) are INSIDE the single band.
2. **Split stability** (pairwise agreement of 24 random-init window
   2-means runs): singles are MORE stable (0.85-1.00) than pairs
   (0.78-0.91) — a drifting single's temporal split is itself a strong
   attractor.

Conclusion: at 60 s / ~70 windows / 5-10 segments per cluster, the window
geometry of a near-collided pair (cross-cos 0.81-0.93) is statistically
indistinguishable from within-speaker drift without truth.  The oracle
window accuracy of 1.000 on these seeds means the EMBEDDING separates the
voices; the clustering margin does not survive the bisection's small-sample
statistics.  The axis is encoder training (gentle margin fine-tune,
chip_queue12) or more audio per decision — not a smarter split test.

Inputs: dumps from scripts/dump_cluster_inputs.py
(``--dur 60 --seed {2000,2001,2002,2005,2010} --out /tmp/tail_SEED.npz``).

    python scripts/exp_tail_bisect.py [--seeds 2002 2010 2000 2001 2005]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from speech_diarization_tpu.cluster import spectral as sp  # noqa: E402


def _refine_2means(wemb, side, iters=20):
    for _ in range(iters):
        if side.sum() < 1 or (~side).sum() < 1:
            return side
        c0 = wemb[side].mean(0); c0 /= np.linalg.norm(c0) + 1e-9
        c1 = wemb[~side].mean(0); c1 /= np.linalg.norm(c1) + 1e-9
        new = wemb @ c0 >= wemb @ c1
        if (new == side).all():
            break
        side = new
    return side


def _candidates(wemb, rng, n_rand=8):
    M = len(wemb)
    cen = wemb - wemb.mean(0, keepdims=True)
    try:
        _, _, vt = np.linalg.svd(cen, full_matrices=False)
        yield cen @ vt[0] >= 0
    except np.linalg.LinAlgError:
        pass
    g = wemb @ wemb.T
    i, j = np.unravel_index(np.argmin(g), g.shape)
    yield wemb @ wemb[i] >= wemb @ wemb[j]
    half = np.zeros(M, bool)
    half[: M // 2] = True
    yield half
    for _ in range(n_rand):
        c = rng.choice(M, 2, replace=False)
        yield wemb @ wemb[c[0]] >= wemb @ wemb[c[1]]


def _cluster_rows(d):
    """Yield (kind, member, widx, seg_of_win, e, es, starts) per cluster."""
    win_embs, starts_s = d["win_embs"], d["starts_s"]
    win_s = float(d["grid_win_s"])
    seg_starts, seg_ends = d["seg_starts"], d["seg_ends"]
    seg_embs, truth = d["seg_embs"], d["seg_truth"]
    labels = sp.spectral_cluster(seg_embs, min_speakers=1, max_speakers=8)
    e = win_embs / (np.linalg.norm(win_embs, axis=1, keepdims=True) + 1e-9)
    es = seg_embs / (np.linalg.norm(seg_embs, axis=1, keepdims=True) + 1e-9)
    wstart = starts_s.astype(np.float64)
    order = np.argsort(seg_starts)
    pos = np.searchsorted(seg_starts[order], wstart, side="right") - 1
    cand = order[np.clip(pos, 0, None)]
    inside = (pos >= 0) & (wstart + win_s <= seg_ends[cand] + 1e-9)
    seg_of_win = np.full(len(wstart), -1, np.int64)
    seg_of_win[inside] = cand[inside]
    for c in range(labels.max() + 1):
        member = np.where(labels == c)[0]
        tl = truth[member]
        comp = {int(t): int((tl == t).sum()) for t in set(tl) if t >= 0}
        n_major = sum(1 for v in comp.values()
                      if v >= 0.2 * max(len(member), 1) and v >= 2)
        kind = "PAIR " if n_major >= 2 else "single"
        wmask = np.isin(seg_of_win, member)
        widx = np.where(wmask)[0]
        if widx.size < 12 or len(member) < 2:
            continue
        yield kind, comp, member, widx, seg_of_win, e, es, seg_starts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[2002, 2010, 2000, 2001, 2005])
    ap.add_argument("--dumps", type=str, default="/tmp/tail_{seed}.npz")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    for seed in args.seeds:
        path = args.dumps.format(seed=seed)
        if not Path(path).exists():
            print(f"seed {seed}: no dump at {path} "
                  f"(run scripts/dump_cluster_inputs.py)", file=sys.stderr)
            continue
        d = np.load(path)
        print(f"=== seed {seed}")
        for kind, comp, member, widx, seg_of_win, e, es, starts in _cluster_rows(d):
            w = e[widx]
            # statistic 1: alternation-seeking search
            best_alt, best_pur = 0.0, 0.0
            for s0 in _candidates(w, rng):
                s = _refine_2means(w, s0.copy())
                if s.sum() < 2 or (~s).sum() < 2:
                    continue
                c0 = w[s].mean(0); c0 /= np.linalg.norm(c0) + 1e-9
                c1 = w[~s].mean(0); c1 /= np.linalg.norm(c1) + 1e-9
                seg_side = (es[member] @ c1) > (es[member] @ c0)
                ss = seg_side[np.argsort(starts[member])]
                alt = float(np.mean(ss[1:] != ss[:-1])) if len(ss) > 1 else 0.0
                purs = [max(sw.mean(), 1 - sw.mean())
                        for sgt in member
                        if (sw := s[seg_of_win[widx] == sgt]).size]
                pur = float(np.mean(purs)) if purs else 0.0
                if pur >= 0.995 and alt > best_alt:
                    best_alt, best_pur = alt, pur
            # statistic 2: random-init split stability
            sides = []
            for _ in range(24):
                c = rng.choice(len(w), 2, replace=False)
                s = _refine_2means(w, w @ w[c[0]] >= w @ w[c[1]])
                if 1 <= s.sum() < len(s):
                    sides.append(s)
            stab = float(np.mean([
                max((sides[i] == sides[j]).mean(),
                    1 - (sides[i] == sides[j]).mean())
                for i in range(len(sides)) for j in range(i + 1, len(sides))
            ])) if len(sides) >= 4 else float("nan")
            print(f"  {kind} comp={comp} n_win={len(w)}: "
                  f"search alt={best_alt:.2f}@pur>={best_pur:.3f} "
                  f"stability={stab:.3f}")


if __name__ == "__main__":
    main()
