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
from .vad import VadNet, VadModel, energy_vad_probs
from .ecapa import EcapaTdnn, EcapaModel
from .eres2netv2 import ERes2NetV2, ERes2NetV2Model
from .campp import CamPlusPlus, CamPlusPlusModel
from .gtcrn import GTCRN, gtcrn_init_params
from .zipenhancer import ZipEnhancerModel
from .demix import DialogDemixer
from .demucs_ref import HTDemucsRef
from .registry import make_encoder, make_encoder_model, BACKENDS

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
    "energy_vad_probs",
    "EcapaTdnn",
    "EcapaModel",
    "ERes2NetV2",
    "ERes2NetV2Model",
    "CamPlusPlus",
    "CamPlusPlusModel",
    "GTCRN",
    "gtcrn_init_params",
    "ZipEnhancerModel",
    "DialogDemixer",
    "HTDemucsRef",
    "make_encoder",
    "make_encoder_model",
    "BACKENDS",
]
