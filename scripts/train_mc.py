#!/usr/bin/env python
"""Multi-condition retraining driver (round 2 quality agenda).

Retrains the shipped VAD and speaker encoder on train/multicond.py data
(two synthesis families + reverb/noise channels), warm-starting from the
round-1 weights.  The first held-out-domain measurement
(scripts/eval_heldout.py) showed the r1 single-family weights at 69% DER
out of family — this is the fix.

    python scripts/train_mc.py vad        [--steps 600]  [--cpu]
    python scripts/train_mc.py encoder    [--steps 600]  [--cpu]
    python scripts/train_mc.py encoder-windowed [--steps 400] [--cpu]

Outputs (overwriting is intentional — these become the shipped defaults):
    weights/vad_conv_mc.npz
    weights/ecapa_mc_full_stream.npz
    weights/ecapa_mc_full.npz
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["vad", "encoder", "encoder-windowed",
                                     "encoder-proto", "segmentation",
                                     "gtcrn", "zipenhancer", "demix"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--cache", type=int, default=768)
    ap.add_argument("--speakers", type=int, default=64)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cold", action="store_true",
                    help="train from scratch instead of warm-starting r1 weights")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--src", type=str, default=None,
                    help="warm-start checkpoint (default: the r1 weights)")
    ap.add_argument("--cpu", action="store_true")
    # encoder-proto hardening knobs (defaults = the v2 run's settings)
    ap.add_argument("--spk-batch", type=int, default=12)
    ap.add_argument("--utt-per-spk", type=int, default=4)
    ap.add_argument("--channel-p", type=float, default=0.5)
    ap.add_argument("--competing-p", type=float, default=0.0)
    ap.add_argument("--hard-pair-frac", type=float, default=0.0,
                    help="encoder-proto: fraction of pool speakers rendered "
                         "as near-collided pairs (clustering-margin "
                         "training for the 60 s in-domain tail)")
    ap.add_argument("--snr-floor", type=float, default=8.0)
    # demix scale knobs (VERDICT r1 #8: the round-1 +3.6 dB net was the
    # 48-channel default trained on CPU; the chip can afford a wider one)
    ap.add_argument("--demix-channels", type=int, default=64)
    ap.add_argument("--demix-depth", type=int, default=5)
    ap.add_argument("--powerset", action="store_true",
                    help="segmentation: train the pyannote-3.x powerset "
                         "multiclass head (PIT-CE) instead of multilabel "
                         "sigmoids")
    ap.add_argument("--overlap-weight", type=float, default=0.0,
                    help="segmentation --powerset: extra loss weight on "
                         "overlapped frames (e.g. 2.0 = 3x)")
    ap.add_argument("--seg-channels", type=int, default=96)
    ap.add_argument("--seg-hidden", type=int, default=96)
    ap.add_argument("--seg-gru", type=int, default=2,
                    help="BiGRU stack depth (pyannote PyanNet runs 4)")
    ap.add_argument("--seg-ds", type=int, default=1,
                    help="segmentation: conv-downsample factor before the "
                         "BiGRU stack (deeper nets at the same scan budget)")
    ap.add_argument("--seg-arch", choices=("gru", "xf"), default="gru",
                    help="segmentation trunk: 'gru' (BiGRU scans) or 'xf' "
                         "(scan-free pre-LN transformer at the ds rate — "
                         "the axon compiler caps GRU depth at 2, attention "
                         "depth is compile-free)")
    ap.add_argument("--seg-xf", type=int, default=4,
                    help="segmentation xf: number of transformer blocks")
    ap.add_argument("--seg-heads", type=int, default=4,
                    help="segmentation xf: attention heads")
    ap.add_argument("--seg-mixed", action="store_true",
                    help="segmentation: draw training chunks 50/50 from the "
                         "in-domain and multi-condition generators (the "
                         "eval measures both; mc-only training leaves an "
                         "in-domain gap)")
    ap.add_argument("--seg-conv-frac", type=float, default=0.0,
                    help="segmentation: fraction of training chunks from the "
                         "CONVERSATION-structured generator (multicond."
                         "make_segmentation_example_conv — dense turn-taking, "
                         "whole-chunk single-speaker turns, true silences; "
                         "the r4 fix for overlap-detector hallucination on "
                         "out-of-family audio)")
    ap.add_argument("--seg-fc", type=int, default=0,
                    help="FC layers before the head (PyanNet runs 2)")
    ap.add_argument("--full-size", action="store_true",
                    help="encoder-proto --cold: train the production-size "
                         "EcapaTdnn instead of the 128-ch proto default")
    ap.add_argument("--proto-channels", type=int, default=None,
                    help="encoder-proto --cold: channel width of the cold "
                         "net (e.g. 256) — the capacity ladder between the "
                         "128-ch proto default and --full-size 512")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)  # recipes log step progress at INFO

    if args.what == "demix":
        # the U-Net backward SIGILLs XLA's SpaceToBatchConverter on the TPU
        # AOT path (ConvolutionVisitor::PropagateOnUsers, 2026-08-18); the
        # pass is a dilated-conv throughput optimization we can live without
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "space-to-batch-converter" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_disable_hlo_passes=space-to-batch-converter"
            ).strip()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from speech_diarization_tpu.train.multicond import (
        ChannelBank, make_mc_speaker_bank, make_speaker_batch_mc,
        make_vad_example_mc,
    )
    from speech_diarization_tpu.train import recipes

    # persistent compile cache (the axon chip pays minutes per new shape);
    # host/context-fingerprinted — cross-machine XLA:CPU AOT entries SIGILL
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)

    wroot = ROOT / "weights"
    channels = ChannelBank(np.random.default_rng(args.seed + 1))
    t0 = time.time()

    if args.what == "vad":
        init = None
        src = Path(args.src) if args.src else wroot / "vad_conv_synthetic.npz"
        if not args.cold and src.exists():
            init = recipes.load_vad_weights(src)
        out = args.out or wroot / "vad_conv_mc.npz"
        params, metrics = recipes.train_vad_synthetic(
            steps=args.steps or 600,
            batch=args.batch or 8,
            lr=args.lr or 1e-3,
            seed=args.seed,
            arch="conv",
            out_path=out,
            example_fn=partial(make_vad_example_mc, channels=channels),
            init_params=init,
        )
        print(f"vad mc done in {time.time()-t0:.0f}s: "
              f"frame_acc {metrics['frame_accuracy']:.4f} -> {out}")
        return

    if args.what == "segmentation":
        from speech_diarization_tpu.train.multicond import (
            make_segmentation_example_mc,
        )

        init = None
        src = Path(args.src) if args.src else wroot / "segmentation_synthetic.npz"
        if not args.cold and src.exists():
            from speech_diarization_tpu.models.port import load_params_meta

            src_meta = (load_params_meta(src) or {}).get("net", {})
            if (src_meta.get("channels", 96) != args.seg_channels
                    or src_meta.get("hidden", 96) != args.seg_hidden
                    or src_meta.get("n_gru", 2) != args.seg_gru
                    or src_meta.get("n_fc", 0) != args.seg_fc
                    or src_meta.get("ds", 1) != args.seg_ds
                    or src_meta.get("arch", "gru") != args.seg_arch
                    or src_meta.get("n_xf", 4) != args.seg_xf):
                print(f"segmentation: src geometry {src_meta} != requested "
                      f"{args.seg_channels}/{args.seg_hidden}/"
                      f"gru{args.seg_gru}/fc{args.seg_fc} — cold start")
                args.cold = True
        if not args.cold and src.exists():
            from speech_diarization_tpu.models.port import load_params_meta

            init = recipes.load_segmentation_weights(src)
            src_powerset = (load_params_meta(src) or {}).get(
                "net", {}).get("powerset", False)
            if args.powerset and not src_powerset:
                # warm-start trunk only: a sigmoid out head (2h, K) cannot
                # seed the powerset head (2h, 2^K) — re-init those two
                import jax as _jax

                from speech_diarization_tpu.models.segmentation import SegNet

                fresh = SegNet(powerset=True, channels=args.seg_channels,
                               hidden=args.seg_hidden, n_gru=args.seg_gru,
                               n_fc=args.seg_fc).init(
                    _jax.random.PRNGKey(args.seed))
                init["out_w"], init["out_b"] = fresh["out_w"], fresh["out_b"]
        out = args.out or wroot / "segmentation_mc.npz"
        ex_fn = partial(make_segmentation_example_mc, channels=channels)
        if args.seg_mixed or args.seg_conv_frac > 0:
            from speech_diarization_tpu.train.multicond import (
                make_segmentation_example_conv,
            )
            from speech_diarization_tpu.train.synthetic import (
                make_segmentation_example,
            )

            mc_fn = ex_fn
            conv_frac = args.seg_conv_frac
            conv_fn = partial(make_segmentation_example_conv,
                              channels=channels)

            def ex_fn(g):  # noqa: F811 — conv / in-domain / mc generator mix
                u = g.uniform()
                if u < conv_frac:
                    return conv_fn(g)
                if args.seg_mixed and u < conv_frac + (1 - conv_frac) / 2:
                    return make_segmentation_example(g)
                return mc_fn(g)
        params, metrics = recipes.train_segmentation_synthetic(
            steps=args.steps or 1500,
            batch=args.batch or 8,
            lr=args.lr or 2e-3,
            seed=args.seed,
            out_path=out,
            example_fn=ex_fn,
            init_params=init,
            powerset=args.powerset,
            channels=args.seg_channels,
            hidden=args.seg_hidden,
            overlap_weight=args.overlap_weight,
            n_gru=args.seg_gru,
            n_fc=args.seg_fc,
            ds=args.seg_ds,
            arch=args.seg_arch,
            n_xf=args.seg_xf,
            n_heads=args.seg_heads,
        )
        print(f"segmentation mc done in {time.time()-t0:.0f}s: "
              f"best-perm acc {metrics['frame_accuracy']:.4f} -> {out}")
        return

    if args.what == "demix":
        from speech_diarization_tpu.models.demix import DialogDemixer

        net = DialogDemixer(channels=args.demix_channels,
                            depth=args.demix_depth)
        init = None
        if args.src:
            # continuation run: geometry travels in the npz __meta__, so the
            # src checkpoint defines the net (the CLI scale knobs are ignored)
            net, init = recipes.load_demixer(args.src)
        out = args.out or wroot / "demix_mc.npz"
        params, metrics = recipes.train_demixer_synthetic(
            steps=args.steps or 800, batch=args.batch or 4,
            lr=args.lr or 5e-4, seed=args.seed, out_path=out, net=net,
            init_params=init)
        print(f"demix done in {time.time()-t0:.0f}s: per-stem SI-SNR "
              f"{metrics['si_snr_mix_db']:.2f} -> {metrics['si_snr_est_db']:.2f} dB "
              f"(+{metrics['si_snr_gain_db']:.2f}) -> {out}")
        return

    if args.what in ("gtcrn", "zipenhancer"):
        from speech_diarization_tpu.train.multicond import (
            make_noisy_clean_batch_mc,
        )

        pair_fn = partial(make_noisy_clean_batch_mc, channels=channels)
        if args.what == "gtcrn":
            init = None
            src = Path(args.src) if args.src else next(
                (wroot / n for n in ("gtcrn_mc.npz", "gtcrn_synthetic.npz")
                 if (wroot / n).exists()), wroot / "gtcrn_synthetic.npz")
            if not args.cold and src.exists():
                import numpy as _np

                init = dict(_np.load(src))
            out = args.out or wroot / "gtcrn_mc.npz"
            params, metrics = recipes.train_gtcrn_synthetic(
                steps=args.steps or 800, batch=args.batch or 8,
                lr=args.lr or 5e-4, seed=args.seed, out_path=out,
                batch_fn=pair_fn, init_params=init)
        else:
            from speech_diarization_tpu.models.port import load_params_npz

            init = None
            src = (Path(args.src) if args.src
                   else wroot / "zipenhancer_synthetic.npz")
            if not args.cold and src.exists():
                init = load_params_npz(src)
            out = args.out or wroot / "zipenhancer_mc.npz"
            params, metrics = recipes.train_zipenhancer_synthetic(
                steps=args.steps or 400, batch=args.batch or 4,
                lr=args.lr or 3e-4, seed=args.seed, out_path=out,
                batch_fn=pair_fn, init_params=init)
        print(f"{args.what} mc done in {time.time()-t0:.0f}s: "
              f"SI-SNR {metrics['si_snr_noisy_db']:.2f} -> "
              f"{metrics['si_snr_enhanced_db']:.2f} dB "
              f"(+{metrics['si_snr_gain_db']:.2f}) -> {out}")
        return

    # encoder variants share the bank/batch source
    bank_fn = make_mc_speaker_bank
    batch_fn = partial(make_speaker_batch_mc, channels=channels)

    if args.what == "encoder":
        src = Path(args.src) if args.src else wroot / "ecapa_synthetic_full_stream.npz"
        init = None
        net = None
        if not args.cold and src.exists():
            model, init = recipes.load_speaker_encoder(src)
            net = model.net
            # reuse the r1 classifier head only if the bank size matches
            import numpy as _np

            z = _np.load(src)
            if "classifier" in z.files and z["classifier"].shape[0] == args.speakers:
                init = dict(init)
                init["classifier"] = z["classifier"]
        out = args.out or wroot / "ecapa_mc_full_stream.npz"
        params, metrics = recipes.train_speaker_encoder_streaming(
            steps=args.steps or 600,
            batch=args.batch or 8,
            n_speakers=args.speakers,
            lr=args.lr or 5e-4,
            seed=args.seed,
            net=net,
            out_path=out,
            utterance_cache=args.cache,
            init_params=init,
            bank_fn=bank_fn,
            batch_fn=batch_fn,
        )
        print(f"stream encoder mc done in {time.time()-t0:.0f}s: "
              f"probe_purity {metrics['probe_purity']:.4f} -> {out}")
        return

    if args.what == "encoder-proto":
        import logging

        logging.basicConfig(level=logging.INFO)
        from speech_diarization_tpu.train.proto import (
            train_speaker_encoder_proto,
        )

        src = Path(args.src) if args.src else wroot / "ecapa_mc_full_stream.npz"
        init = None
        net = None
        if not args.cold and src.exists():
            model, init = recipes.load_speaker_encoder(src)
            net = model.net
        elif args.full_size:
            # cold full-size: the production EcapaTdnn geometry (512 ch,
            # emb 192) instead of the proto recipe's 128-ch default
            from speech_diarization_tpu.models.ecapa import EcapaTdnn

            net = EcapaTdnn()
        elif args.proto_channels:
            from speech_diarization_tpu.models.ecapa import EcapaTdnn

            c = args.proto_channels
            net = EcapaTdnn(n_mels=40, channels=c,
                            emb_dim=max(64, c // 2), scale=4,
                            se_channels=max(32, c // 4),
                            att_channels=max(32, c // 4))
        out = args.out or wroot / "ecapa_proto_stream.npz"
        params, metrics = train_speaker_encoder_proto(
            steps=args.steps or 2000,
            lr=args.lr or 3e-4,
            seed=args.seed,
            net=net,
            out_path=out,
            init_params=init,
            spk_per_batch=args.spk_batch,
            utt_per_spk=args.utt_per_spk,
            channel_p=args.channel_p,
            competing_p=args.competing_p,
            channel_kwargs={"snr_db": (args.snr_floor, 30.0)},
            hard_pair_frac=args.hard_pair_frac,
        )
        print(f"proto encoder done in {time.time()-t0:.0f}s: "
              f"unseen_separation {metrics['unseen_separation']:.4f} "
              f"hard_pair_margin {metrics.get('hard_pair_margin')} -> {out}")
        return

    if args.what == "encoder-windowed":
        src = wroot / "ecapa_synthetic_full.npz"
        init = None
        net = None
        if not args.cold and src.exists():
            model, init = recipes.load_speaker_encoder(src)
            net = model.net
        out = args.out or wroot / "ecapa_mc_full.npz"
        params, metrics = recipes.train_speaker_encoder_synthetic(
            steps=args.steps or 400,
            batch=args.batch or 16,
            n_speakers=args.speakers,
            lr=args.lr or 5e-4,
            seed=args.seed,
            net=net,
            out_path=out,
            utterance_cache=args.cache,
            init_params=init,
            bank_fn=bank_fn,
            batch_fn=batch_fn,
        )
        print(f"windowed encoder mc done in {time.time()-t0:.0f}s: "
              f"probe_purity {metrics['probe_purity']:.4f} -> {out}")


if __name__ == "__main__":
    main()
