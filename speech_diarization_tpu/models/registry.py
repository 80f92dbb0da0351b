"""Multi-backend speaker-encoder selector.

Mirror of ``SpeakerEncoder`` (``diar_diag.py:127-177``): one factory that
returns a jitted ``[B, T] -> [B, 192]`` encode function for any supported
backend, optionally loading ported weights (npz from ``models/port.py``).
"""
from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable

import jax

BACKENDS = ("ecapa", "eres2netv2", "campp")


def make_encoder(
    backend: str = "ecapa",
    weights: str | Path | None = None,
    sample_rate: int = 16000,
    seed: int = 0,
    jit: bool = True,
) -> tuple[Callable, int]:
    """Returns (encode_fn, emb_dim).  ``encode_fn(wavs [B,T]) -> [B,D]``."""
    if backend == "ecapa":
        from .ecapa import EcapaModel

        model = EcapaModel(sample_rate=sample_rate)
    elif backend == "eres2netv2":
        from .eres2netv2 import ERes2NetV2Model

        model = ERes2NetV2Model(sample_rate=sample_rate)
    elif backend == "campp":
        from .campp import CamPlusPlusModel

        model = CamPlusPlusModel(sample_rate=sample_rate)
    else:
        raise ValueError(f"unknown encoder backend {backend!r}; choose from {BACKENDS}")

    if weights is not None:
        from .port import load_params_npz

        params = load_params_npz(weights)
    else:
        params = model.init(jax.random.PRNGKey(seed))

    fn = partial(model.encode_batch, params)
    if jit:
        fn = jax.jit(fn)
    return fn, model.net.emb_dim
