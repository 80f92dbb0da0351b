"""VAD post-processing chain: probabilities -> speech segments.

The device part (hysteresis + morphology) replaces the numba/scipy chain at
``vad.py:59-87``; the final mask->segments conversion runs vectorized on host
(``ops/segments.py``).  Top-level mirror of ``silero_vad_segments``
(``vad.py:167-186``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VadConfig
from ..ops.hysteresis import hysteresis_binarize
from ..ops.morphology import morph_open_close
from ..ops.segments import mask_to_segments_host
from ..types import SegmentArray


def vad_mask_from_probs(probs: jax.Array, cfg: VadConfig) -> jax.Array:
    """[T] probs -> [T] bool mask (hysteresis + morphological open/close),
    fully on device / jittable."""
    mask = hysteresis_binarize(probs, cfg.on_threshold, cfg.off_threshold)
    return morph_open_close(mask, cfg.hop_ms, cfg.morph_open_ms, cfg.morph_close_ms)


_vad_mask_jit = jax.jit(vad_mask_from_probs, static_argnames=("cfg",))


def vad_segments_from_probs(probs, cfg: VadConfig | None = None) -> SegmentArray:
    """probs (device or host array) -> padded speech segments."""
    cfg = cfg or VadConfig()
    mask = np.asarray(_vad_mask_jit(jnp.asarray(probs), cfg))
    return mask_to_segments_host(
        mask,
        hop_ms=cfg.hop_ms,
        min_speech_ms=cfg.min_speech_ms,
        min_gap_ms=cfg.min_silence_ms,
        speech_pad_ms=cfg.speech_pad_ms,
    )
