"""speech_diarization_tpu — a TPU-native (JAX/XLA/Pallas) speaker-diarization,
speech-enhancement and source-separation framework.

Re-implements the capabilities of the reference toolkit
``hzane/speech-diarization`` (see SURVEY.md) with a TPU-first architecture:
dense fixed-shape window grids, whole-pipeline-on-device compute, Pallas
kernels for the hot DSP ops, and `jax.sharding` meshes for multi-chip scale.
"""

__version__ = "0.1.0"

from .config import (
    DiarizationConfig,
    AudioConfig,
    VadConfig,
    ScdConfig,
    EmbedConfig,
    ClusterConfig,
    ResegConfig,
    MergeConfig,
    StemsConfig,
    EnhanceConfig,
    ShardingConfig,
    config_from_dict,
    config_to_dict,
)
from .types import Segment, SegmentArray

__all__ = [
    "__version__",
    "DiarizationConfig",
    "AudioConfig",
    "VadConfig",
    "ScdConfig",
    "EmbedConfig",
    "ClusterConfig",
    "ResegConfig",
    "MergeConfig",
    "StemsConfig",
    "EnhanceConfig",
    "ShardingConfig",
    "config_from_dict",
    "config_to_dict",
    "Segment",
    "SegmentArray",
]
