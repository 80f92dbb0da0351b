#!/usr/bin/env python
"""VERDICT r2 #6: the one untried babble@5/15 dB experiment — run the
DEMIXER (dialog stem) and ZipEnhancer as *separation front-ends* ahead of
diarization and measure whether speaker confusion moves.

Context: babble domains sit at 34-52% DER, all confusion; enhancement
(GTCRN, scope=full/vad) measured DER-neutral there (STATUS r2), and the
oracle-separability probe reads 0.56-0.69 window accuracy.  If a true
separation pre-stage cannot move confusion either, the 1-channel-bound
claim is earned and gets pinned as a documented limit.

    python scripts/exp_babble_frontend.py [--cpu] [--n-files 3]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-files", type=int, default=3)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--snrs", default="5,15")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.metrics import diarization_error_rate
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.heldout import make_conversation_heldout
    from speech_diarization_tpu.train.recipes import (
        load_speaker_encoder, load_vad,
    )
    from speech_diarization_tpu.types import SegmentArray
    from speech_diarization_tpu.utils.cache import setup_compilation_cache
    from speech_diarization_tpu.utils.weights import (
        ENCODER_PREFERENCE, prefer_weights,
    )

    setup_compilation_cache(ROOT)
    sr = 16000
    model, params = load_speaker_encoder(prefer_weights(ENCODER_PREFERENCE))
    vad, vp = load_vad(prefer_weights(("vad_conv_mc.npz",
                                      "vad_conv_synthetic.npz")))
    pipe = DiarizationPipeline(
        DiarizationConfig(cluster=ClusterConfig(max_speakers=8)),
        encoder=(model, params),
        vad_probs_fn=jax.jit(partial(vad.probs, vp)))

    # ---- front-ends ---------------------------------------------------------
    def fe_none(y):
        return y

    def make_fe_zipenhancer():
        from speech_diarization_tpu.pipelines.enhance import make_enhance_fn

        fn = make_enhance_fn("zipenhancer")
        return lambda y: np.asarray(fn(y)).astype(np.float32)

    def make_fe_demix():
        from speech_diarization_tpu.pipelines.demix import EnsembleDemixer

        dmx = EnsembleDemixer()

        def fe(y):
            # 16 kHz mono -> 44.1 kHz stereo -> dialog stem -> back
            from speech_diarization_tpu.dsp.resample import resample_host

            up = resample_host(y, sr, 44100)
            stems = dmx.separate(np.stack([up, up]), 44100)
            dialog = stems[2].mean(axis=0)  # STEMS = (music, effect, dialog)
            return resample_host(
                dialog, 44100, sr).astype(np.float32)[: y.shape[-1]]

        return fe

    fes = {"raw": fe_none}
    try:
        fes["zipenhancer"] = make_fe_zipenhancer()
    except Exception as e:  # pragma: no cover
        print(f"zipenhancer front-end unavailable: {e}")
    try:
        fes["demix-dialog"] = make_fe_demix()
    except Exception as e:  # pragma: no cover
        print(f"demix front-end unavailable: {e}")

    for snr in (float(s) for s in args.snrs.split(",")):
        for name, fe in fes.items():
            ders, confs = [], []
            for i in range(args.n_files):
                rng = np.random.default_rng(1000 + i)
                wave, (s, e, k) = make_conversation_heldout(
                    rng, args.dur, n_speakers=3, sr=sr,
                    snr_db=snr, noise_kind="babble")
                truth = SegmentArray(np.asarray(s), np.asarray(e),
                                     np.asarray(k))
                y = fe(np.asarray(wave, np.float32))
                res = pipe((y, sr))
                d = diarization_error_rate(truth, res.segments, collar_s=0.25)
                ders.append(d.der * 100)
                confs.append(d.confusion * 100)
            print(f"babble{int(snr):2d}  {name:14s} mean_der={np.mean(ders):6.2f} "
                  f"mean_conf={np.mean(confs):6.2f} ders={[round(x, 1) for x in ders]}",
                  flush=True)


if __name__ == "__main__":
    main()
