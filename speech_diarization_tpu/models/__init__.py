"""L1 — model zoo: TPU-native (Flax/JAX) re-implementations of the nets the
reference wraps from third parties (SURVEY.md §2.1 C3, C6, C7, C22 and §2.4).

All models are inference-first (the reference is inference-only) but fully
differentiable; training steps live in ``speech_diarization_tpu.train``.
"""
from .layers import (
    conv1d_torch,
    conv2d_torch,
    conv_transpose2d_torch,
    batch_norm_apply,
    prelu,
    gru_sequence,
    GRUParams,
)
from .vad import VadNet, VadModel
from .ecapa import EcapaTdnn, EcapaModel
from .gtcrn import GTCRN, gtcrn_init_params

__all__ = [
    "conv1d_torch",
    "conv2d_torch",
    "conv_transpose2d_torch",
    "batch_norm_apply",
    "prelu",
    "gru_sequence",
    "GRUParams",
    "VadNet",
    "VadModel",
    "EcapaTdnn",
    "EcapaModel",
    "GTCRN",
    "gtcrn_init_params",
]
