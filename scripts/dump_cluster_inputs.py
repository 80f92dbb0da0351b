#!/usr/bin/env python
"""Dump the flagship pipeline's cluster-stage inputs for a synthetic file:
window-grid embeddings, grid starts, post-SCD segments, segment embeddings,
and per-segment truth labels (majority overlap).  Output: an .npz for
offline clustering experiments (scripts/exp_spectral_sharpen.py style)
without re-running the encoder each iteration.

    python scripts/dump_cluster_inputs.py --dur 600 --seed 0 \
        --out /tmp/cluster600.npz
"""
from __future__ import annotations

import argparse
import sys
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=600.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/cluster600.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    import importlib

    # pipelines/__init__ re-exports the diarize FUNCTION, which shadows the
    # submodule attribute — resolve the module through importlib instead
    dz = importlib.import_module("speech_diarization_tpu.pipelines.diarize")
    from speech_diarization_tpu.train.recipes import (
        load_speaker_encoder, load_vad,
    )
    from speech_diarization_tpu.train.synthetic import make_conversation
    from speech_diarization_tpu.utils.cache import setup_compilation_cache
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    setup_compilation_cache(ROOT)
    wave, (ts, te, tk) = make_conversation(
        np.random.default_rng(args.seed), args.dur, n_speakers=3, sr=16000)

    captured = {}
    orig = dz.segment_embeddings_from_grid

    def capture(win_embs, starts_s, grid_win_s, segs):
        out = orig(win_embs, starts_s, grid_win_s, segs)
        captured.update(
            win_embs=np.asarray(win_embs), starts_s=np.asarray(starts_s),
            grid_win_s=float(grid_win_s), seg_starts=np.asarray(segs.starts),
            seg_ends=np.asarray(segs.ends), seg_embs=np.asarray(out))
        return out

    dz.segment_embeddings_from_grid = capture
    try:
        model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE))
        vad, vp = load_vad(prefer_weights(("vad_conv_mc.npz",
                                           "vad_conv_synthetic.npz")))
        pipe = dz.DiarizationPipeline(
            DiarizationConfig(cluster=ClusterConfig(method="spectral",
                                                    max_speakers=8)),
            encoder=(model, params),
            vad_probs_fn=jax.jit(partial(vad.probs, vp)))
        pipe((np.asarray(wave, np.float32), 16000))
    finally:
        dz.segment_embeddings_from_grid = orig

    # per-segment truth label by maximal time overlap
    ts, te, tk = np.asarray(ts), np.asarray(te), np.asarray(tk)
    ns = len(captured["seg_starts"])
    truth = np.full(ns, -1, np.int32)
    for i, (a, b) in enumerate(zip(captured["seg_starts"],
                                   captured["seg_ends"])):
        ov = np.minimum(b, te) - np.maximum(a, ts)
        by_spk = np.zeros(int(tk.max()) + 1)
        np.add.at(by_spk, tk, np.maximum(ov, 0.0))
        if by_spk.max() > 0:  # pure-false-alarm segments keep -1 (ADVICE r2)
            truth[i] = int(by_spk.argmax())
    captured["seg_truth"] = truth
    # raw waveform rides along so offline experiments can re-embed at other
    # window geometries (exp_tail_longwin.py: more audio per decision)
    captured["wave"] = np.asarray(wave, np.float32)
    np.savez(args.out, **captured)
    print({"out": args.out, "n_segments": ns,
           "n_windows": len(captured["win_embs"])})


if __name__ == "__main__":
    main()
