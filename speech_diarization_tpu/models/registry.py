"""Multi-backend speaker-encoder selector.

Mirror of ``SpeakerEncoder`` (``diar_diag.py:127-177``): one factory that
returns a jitted ``[B, T] -> [B, D]`` encode function for any supported
backend, loading the right checkpoint format per backend:

  ecapa       .npz from the synthetic trainer (architecture in the __meta__
              sidecar) or a SpeechBrain ``embedding_model.ckpt``
              (``models/port_ecapa.py``); with no weights, falls back to the
              shipped synthetic weights (full-size preferred), else random
              with a loud warning.
  eres2netv2  3D-Speaker torch checkpoint or ONNX (``models/eres2netv2.py``).
  campp       3D-Speaker torch checkpoint or ONNX (``models/campp.py``).
"""
from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable

import jax

from ..utils.logging import get_logger

log = get_logger("registry")

BACKENDS = ("ecapa", "eres2netv2", "campp")

_WEIGHTS_DIR = Path(__file__).resolve().parents[2] / "weights"


def _make_ecapa(weights, sample_rate: int, seed: int):
    from .ecapa import EcapaModel

    if weights is None:
        from ..utils.weights import ENCODER_PREFERENCE, prefer_weights

        weights = prefer_weights(ENCODER_PREFERENCE)
    if weights is not None and str(weights).endswith(".npz"):
        from ..train.recipes import load_speaker_encoder

        log.info("ecapa: loading %s", weights)
        model, params = load_speaker_encoder(weights)
        model.sample_rate = sample_rate
        return model, params
    if weights is not None:  # SpeechBrain embedding_model.ckpt
        from .port_ecapa import load_ecapa_speechbrain

        log.info("ecapa: loading SpeechBrain checkpoint %s", weights)
        model = EcapaModel(sample_rate=sample_rate)
        return model, load_ecapa_speechbrain(weights, model.net)
    log.warning("ecapa: no weights given and none shipped — RANDOM weights; "
                "speaker labels will be meaningless")
    model = EcapaModel(sample_rate=sample_rate)
    return model, model.init(jax.random.PRNGKey(seed))


def make_encoder_model(
    backend: str = "ecapa",
    weights: str | Path | None = None,
    sample_rate: int = 16000,
    seed: int = 0,
) -> tuple:
    """Returns the raw ``(model, params)`` pair for a backend.

    Prefer this over :func:`make_encoder` when constructing a
    ``DiarizationPipeline``: passing ``encoder=(model, params)`` lets the
    pipeline resolve ``grid_backend='auto'`` correctly — streaming-trained
    weights (``*_stream.npz``) run through the streaming trunk-shared grid
    they were trained under, instead of the windowed per-utterance-stats
    grid (a measured multi-point DER regression the other way around).
    """
    if backend == "ecapa":
        model, params = _make_ecapa(weights, sample_rate, seed)
    elif backend == "eres2netv2":
        from .eres2netv2 import ERes2NetV2Model, load_eres2netv2

        model = ERes2NetV2Model(sample_rate=sample_rate)
        if weights is not None:
            params = load_eres2netv2(weights, model.net)
        else:
            log.warning("eres2netv2: no checkpoint — RANDOM weights; port one "
                        "via models/eres2netv2.load_eres2netv2")
            params = model.init(jax.random.PRNGKey(seed))
    elif backend == "campp":
        from .campp import CamPlusPlusModel, load_campp

        model = CamPlusPlusModel(sample_rate=sample_rate)
        if weights is not None:
            params = load_campp(weights, model.net)
        else:
            log.warning("campp: no checkpoint — RANDOM weights; port one via "
                        "models/campp.load_campp")
            params = model.init(jax.random.PRNGKey(seed))
    else:
        raise ValueError(f"unknown encoder backend {backend!r}; choose from {BACKENDS}")
    return model, params


def make_encoder(
    backend: str = "ecapa",
    weights: str | Path | None = None,
    sample_rate: int = 16000,
    seed: int = 0,
    jit: bool = True,
) -> tuple[Callable, int]:
    """Returns (encode_fn, emb_dim).  ``encode_fn(wavs [B,T]) -> [B,D]``."""
    model, params = make_encoder_model(backend, weights, sample_rate, seed)
    fn = partial(model.encode_batch, params)
    if jit:
        fn = jax.jit(fn)
    return fn, model.net.emb_dim
