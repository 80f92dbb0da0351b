#!/usr/bin/env python
"""Cross-family SI-SNR eval for enhancement checkpoints.

Ship decisions for retrained enhancers need BOTH noise families measured
(the mc retrain improves its own family by construction; the question is
whether it regresses the other).  Evaluates each checkpoint on:

  * r1 family   — recipes.make_noisy_clean_batch (the round-1 synthesis)
  * mc family   — multicond.make_noisy_clean_batch_mc (babble/reverb beds,
                  both voice families)

using the exact forward the training-eval used, so numbers are comparable
to the train logs (e.g. gtcrn_mc: r1-family 8.77 dB / mc-family 11.3 dB).

    python scripts/eval_enhancer.py --backend zipenhancer \
        --weights weights/zipenhancer_mc.npz weights/zipenhancer_synthetic.npz
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
    ap.add_argument("--backend", choices=["gtcrn", "zipenhancer"],
                    default="zipenhancer")
    ap.add_argument("--weights", nargs="+", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dur", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.train import recipes
    from speech_diarization_tpu.train.multicond import (
        ChannelBank, make_noisy_clean_batch_mc,
    )
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)

    if args.backend == "gtcrn":
        from speech_diarization_tpu.dsp.stft import istft_ri, stft_ri
        from speech_diarization_tpu.models.gtcrn import GTCRN

        net = GTCRN()

        def forward(params, noisy):
            spec = stft_ri(noisy, 512, 256)
            return istft_ri(net.apply(params, spec), 512, 256,
                            length=noisy.shape[-1])
    else:
        from speech_diarization_tpu.models.zipenhancer import ZipEnhancerModel

        model = ZipEnhancerModel()
        forward = model.apply

    families = {
        "r1": recipes.make_noisy_clean_batch,
        "mc": partial(make_noisy_clean_batch_mc,
                      channels=ChannelBank(np.random.default_rng(args.seed))),
    }
    batches = {name: fn(np.random.default_rng(args.seed + 1),
                        args.batch, args.dur)
               for name, fn in families.items()}

    from speech_diarization_tpu.models.port import load_params_npz

    fwd = jax.jit(forward)
    for wpath in args.weights:
        params = load_params_npz(wpath)
        row = {}
        for name, (noisy, clean) in batches.items():
            enh = np.asarray(fwd(params, jnp.asarray(noisy)))
            row[name] = (recipes.si_snr_db(noisy, clean),
                         recipes.si_snr_db(enh, clean))
        cells = "  ".join(
            f"{name}: {n:.2f} -> {e:.2f} dB (+{e - n:.2f})"
            for name, (n, e) in row.items())
        print(f"{Path(wpath).name:36s} {cells}")


if __name__ == "__main__":
    main()
