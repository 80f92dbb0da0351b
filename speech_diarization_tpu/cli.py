"""Unified command-line interface.

The reference spreads its UX over three inconsistent CLI stacks (typer,
jsonargparse auto_cli, dacite-hydrated dataclasses — SURVEY.md §5 'Config')
with a positional-argument bug that silently shifts every hyperparameter one
slot (``anti_stick_diarize.py:563-599``, SURVEY.md §2.5 item 3).  Here there is
ONE argparse CLI with subcommands; every knob is keyword-only and hydrates the
single strict config schema (``config.py``).

  sdtpu diarize <audio> [--out-dir out] [--cluster-method spectral] ...
  sdtpu batch <root> [--min-speakers 2 --max-speakers 6] ...
  sdtpu diag <audio> --out-dir out ...
  sdtpu enhance <root> [--backend gtcrn]
  sdtpu demix <root> [--output out]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_common_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", type=str, default=None,
                   help="JSON file hydrating the full DiarizationConfig")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--target-lufs", type=float, default=-18.0)
    p.add_argument("--no-loudness-norm", action="store_true")
    p.add_argument("--vad-on", type=float, default=0.6)
    p.add_argument("--vad-off", type=float, default=0.4)
    p.add_argument("--min-speech-ms", type=float, default=250.0)
    p.add_argument("--min-silence-ms", type=float, default=100.0)
    p.add_argument("--speech-pad-ms", type=float, default=40.0)
    p.add_argument("--scd-threshold", type=float, default=1.0)
    p.add_argument("--no-scd", action="store_true")
    p.add_argument("--cluster-method", default="spectral",
                   choices=["spectral", "ahc", "hdbscan", "hdbscan2"])
    p.add_argument("--cos-threshold", type=float, default=0.70)
    p.add_argument("--min-speakers", type=int, default=1)
    p.add_argument("--max-speakers", type=int, default=8)
    p.add_argument("--no-reseg", action="store_true")
    p.add_argument("--hmm", action="store_true", help="sticky-HMM resegmentation")
    p.add_argument("--merge-gap-s", type=float, default=0.5)
    p.add_argument("--merge-max-turn-s", type=float, default=30.0)
    p.add_argument("--merge-min-cos", type=float, default=0.80)
    p.add_argument("--enhance", default=None,
                   choices=["gtcrn", "zipenhancer", "demix-dialog", "off"],
                   help="denoise front-end before diarization; default is "
                        "gtcrn with scope 'auto' (engages only on noisy "
                        "files); 'demix-dialog' runs the dialog-stem "
                        "SEPARATION front-end (rescues competing-speech "
                        "babble: 26.8%% -> 14.6%% DER @5 dB, STATUS "
                        "2026-08-19); 'off' disables the stage")
    p.add_argument("--enhance-scope", default="auto",
                   choices=["full", "vad", "auto"],
                   help="'vad' denoises only the VAD input (keeps speaker "
                        "cues raw); 'auto' engages vad-scope only when the "
                        "file measures noisy")
    p.add_argument("--enhance-weights", type=str, default=None,
                   help=".npz checkpoint override for the enhancer")
    p.add_argument("--overlap", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="overlap rescue: add second-speaker segments where "
                        "the segmentation model detects >=2 active speakers "
                        "(segment/overlap.py; the flagship map stays "
                        "authoritative for speaker identity).  Default ON "
                        "(config default); --no-overlap disables")
    p.add_argument("--overlap-weights", type=str, default=None,
                   help="segmentation checkpoint for the overlap detector")
    p.add_argument("--encoder", default="ecapa",
                   choices=["ecapa", "eres2netv2", "campp"])
    p.add_argument("--encoder-weights", type=str, default=None,
                   help="npz checkpoint (models/port.py format)")
    p.add_argument("--vad-backend", default="auto",
                   choices=["auto", "energy", "neural"],
                   help="'auto' uses the trained neural VAD when weights are "
                        "available (shipped or --vad-weights) and falls back "
                        "to the deterministic energy VAD otherwise")
    p.add_argument("--vad-weights", type=str, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the default backend may be a "
                        "shared accelerator; use this for smoke runs so they "
                        "cannot contend with a training/bench process)")
    p.add_argument("--verbose", "-v", action="store_true")


def build_config(args: argparse.Namespace):
    from .config import (
        AudioConfig, ClusterConfig, DiarizationConfig, EnhanceConfig,
        MergeConfig, OverlapConfig, ResegConfig, ScdConfig, VadConfig,
        config_from_dict,
    )

    if args.config:
        with open(args.config) as f:
            return config_from_dict(json.load(f))
    return DiarizationConfig(
        enhance=EnhanceConfig(
            enabled=getattr(args, "enhance", None) != "off",
            backend=(getattr(args, "enhance", None)
                     if getattr(args, "enhance", None) not in (None, "off")
                     else "gtcrn"),
            scope=getattr(args, "enhance_scope", "auto"),
            weights=getattr(args, "enhance_weights", None),
        ),
        audio=AudioConfig(
            sample_rate=args.sample_rate,
            target_lufs=None if args.no_loudness_norm else args.target_lufs,
        ),
        vad=VadConfig(
            on_threshold=args.vad_on, off_threshold=args.vad_off,
            min_speech_ms=args.min_speech_ms, min_silence_ms=args.min_silence_ms,
            speech_pad_ms=args.speech_pad_ms,
        ),
        scd=ScdConfig(enabled=not args.no_scd, peak_z_threshold=args.scd_threshold),
        cluster=ClusterConfig(
            method=args.cluster_method, cos_threshold=args.cos_threshold,
            min_speakers=args.min_speakers, max_speakers=args.max_speakers,
        ),
        reseg=ResegConfig(enabled=not args.no_reseg, hmm=args.hmm),
        merge=MergeConfig(
            max_gap_s=args.merge_gap_s, max_turn_s=args.merge_max_turn_s,
            min_cos=args.merge_min_cos,
        ),
        overlap=OverlapConfig(
            # tri-state: None = keep the config default (ON since r5)
            **({} if getattr(args, "overlap", None) is None
               else {"enabled": args.overlap}),
            weights=getattr(args, "overlap_weights", None),
        ),
    )


def build_pipeline_kwargs(args: argparse.Namespace) -> dict:
    from functools import partial

    import jax

    from .models.registry import make_encoder_model

    kwargs: dict = {}
    # pass the raw (model, params) pair so the pipeline's grid_backend='auto'
    # resolves correctly: streaming-trained weights engage the streaming
    # trunk-shared grid they were trained under (ADVICE r1)
    kwargs["encoder"] = make_encoder_model(
        args.encoder, weights=args.encoder_weights, sample_rate=args.sample_rate)
    if args.vad_backend in ("neural", "auto"):
        from .models.vad import VadModel
        from .train.recipes import load_vad

        weights = args.vad_weights
        if weights is None:
            from .utils.weights import prefer_weights

            # prefer the multi-condition conv TCN (robust to noise/reverb/
            # out-of-family speech, eval_vad.py), then the in-domain conv
            # net; the GRU net remains the Silero-parity/streaming backend
            shipped = prefer_weights(("vad_conv_mc.npz",
                                      "vad_conv_synthetic.npz",
                                      "vad_synthetic.npz"))
            weights = str(shipped) if shipped else None
        if weights:
            model, params = load_vad(weights)
            model.sample_rate = args.sample_rate
            kwargs["vad_probs_fn"] = jax.jit(partial(model.probs, params))
        elif args.vad_backend == "neural":
            import logging

            logging.getLogger("sdtpu.cli").warning(
                "--vad-backend neural but no weights found; RANDOM VAD "
                "params (results will be meaningless — pass --vad-weights)")
            model = VadModel(sample_rate=args.sample_rate)
            params = model.init(jax.random.PRNGKey(1))
            kwargs["vad_probs_fn"] = jax.jit(partial(model.probs, params))
        # 'auto' with no weights: leave the pipeline's energy VAD default
    return kwargs


def _setup_logging(verbose: bool) -> None:
    if verbose:
        import os

        os.environ["SDTPU_LOG_LEVEL"] = "INFO"


def cmd_diarize(args) -> int:
    from .io.writers import relabel_speakers, save_csv, save_json, save_srt, write_rttm
    from .pipelines.diarize import DiarizationPipeline

    cfg = build_config(args)
    pipe = DiarizationPipeline(cfg, **build_pipeline_kwargs(args))
    result = pipe(args.audio)
    segs = result.segments

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.audio).stem
    fmts = {"rttm", "json", "srt", "csv"} if args.format == "all" else {args.format}
    if "rttm" in fmts:
        write_rttm(out_dir / f"{stem}.rttm", segs, uri=stem)
    if "json" in fmts:
        save_json(out_dir / f"{stem}.json", segs)
    if "srt" in fmts:
        save_srt(out_dir / f"{stem}.srt", segs)
    if "csv" in fmts:
        save_csv(out_dir / f"{stem}.csv", segs)

    print(f"segments: {len(segs)}; speakers: {result.num_speakers}")
    for i, seg in enumerate(relabel_speakers(segs)[:20], 1):
        print(f"{i:02d}  {seg['start']:.2f}-{seg['end']:.2f}  {seg['speaker']}")
    return 0


def cmd_batch(args) -> int:
    from .pipelines.baseline import run_batch

    cfg = build_config(args)
    done = run_batch(args.root, cfg, with_rttm=True, engine=args.engine,
                     **build_pipeline_kwargs(args))
    print(f"processed {len(done)} files")
    return 0


def cmd_diag(args) -> int:
    from .pipelines.diagnostic import diagnose

    cfg = build_config(args)
    report = diagnose(args.audio, cfg, out_dir=args.out_dir,
                      cluster_method=args.cluster_method,
                      **build_pipeline_kwargs(args))
    stats = report.similarity_stats()
    print(f"segments: {len(report.segments)}")
    print(f"adjacent cos   mu={stats['adjacent_mean']:.3f} sigma={stats['adjacent_std']:.3f}")
    print(f"non-adj  cos   mu={stats['nonadjacent_mean']:.3f} sigma={stats['nonadjacent_std']:.3f}")
    print(report.tuning_hint())
    return 0


def cmd_enhance(args) -> int:
    from .pipelines.enhance import enhance_batch

    params = None
    if args.weights:
        if str(args.weights).endswith(".npz"):
            from .models.port import load_params_npz

            params = load_params_npz(args.weights)
        elif args.backend == "gtcrn":
            # the reference's artifact format: models.gtcrn/
            # model_trained_on_dns3.tar (gtcrn_wrap.py:156-161)
            from .models.port import load_gtcrn_checkpoint

            params = load_gtcrn_checkpoint(args.weights)
        elif args.backend == "zipenhancer-ref":
            # ModelScope bundle state_dict (zipenhancer_pipe.py:119-125)
            from .models.port_zipenhancer import load_zipenhancer_modelscope

            params = load_zipenhancer_modelscope(args.weights)
        else:
            raise SystemExit(
                f"--weights {args.weights}: torch checkpoints are supported "
                "for --backend gtcrn (.tar) and zipenhancer-ref (ModelScope "
                "bin); use .npz for the trainable backends")
    written = enhance_batch(args.root, backend=args.backend, params=params)
    print(f"enhanced {len(written)} files")
    return 0


def cmd_demix(args) -> int:
    from .pipelines.demix import separate_dialog

    written = separate_dialog(args.root, args.output)
    print(f"wrote {len(written)} stems")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="sdtpu",
                                     description="TPU-native speaker diarization")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("diarize", help="diarize one file")
    p.add_argument("audio")
    p.add_argument("--out-dir", default="out")
    p.add_argument("--format", default="all",
                   choices=["rttm", "json", "srt", "csv", "all"])
    _add_common_config_args(p)
    p.set_defaults(fn=cmd_diarize)

    p = sub.add_parser("batch", help="batch-diarize a directory (with stems)")
    p.add_argument("root")
    p.add_argument("--engine", default="flagship",
                   choices=["flagship", "segmentation"],
                   help="segmentation = PyanNet-class chunk-local activity "
                        "engine (overlap-aware)")
    _add_common_config_args(p)
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("diag", help="diagnostic run with plots")
    p.add_argument("audio")
    p.add_argument("--out-dir", default="out")
    _add_common_config_args(p)
    p.set_defaults(fn=cmd_diag)

    p = sub.add_parser("enhance", help="batch speech enhancement")
    p.add_argument("root")
    p.add_argument("--backend", default="gtcrn",
                   choices=["gtcrn", "zipenhancer", "zipenhancer-ref"],
                   help="zipenhancer-ref = the published ZipEnhancer graph "
                        "(loads the real ModelScope checkpoint); zipenhancer "
                        "= the trainable same-family net")
    p.add_argument("--weights", default=None)
    p.add_argument("--verbose", "-v", action="store_true")
    p.set_defaults(fn=cmd_enhance)

    p = sub.add_parser("demix", help="dialog/effect/music separation")
    p.add_argument("root")
    p.add_argument("--output", default=None)
    p.add_argument("--verbose", "-v", action="store_true")
    p.set_defaults(fn=cmd_demix)

    args = parser.parse_args(argv)
    if getattr(args, "cpu", False):
        import jax

        # must happen before any device touch; some accelerator plugins
        # ignore the JAX_PLATFORMS env var, the config update is authoritative
        jax.config.update("jax_platforms", "cpu")
    _setup_logging(getattr(args, "verbose", False))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
