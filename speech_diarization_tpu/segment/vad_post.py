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


def frame_energy_db_chunk(
    y: jax.Array, hop: int, n_extra: int = 1
) -> jax.Array:
    """[..., T_chunk] wave -> [..., F_chunk] per-frame energy in dB (power,
    relative to full scale).  Matches ``chunked_framewise``'s framewise
    contract (``F_chunk = T_chunk // hop + n_extra``) so the energy grid is
    produced by the same bucketed chunk machinery as the VAD probs it gates —
    constant shapes, one dispatch, no per-file recompiles."""
    n = y.shape[-1] // hop
    yf = y[..., : n * hop].reshape(y.shape[:-1] + (n, hop))
    e = 10.0 * jnp.log10(jnp.mean(yf * yf, axis=-1) + 1e-12)
    if n_extra:
        pad = jnp.full(e.shape[:-1] + (n_extra,), -120.0, e.dtype)
        e = jnp.concatenate([e, pad], axis=-1)
    return e


def apply_energy_veto(
    probs: np.ndarray, frame_energy_db: np.ndarray, cfg: VadConfig
) -> np.ndarray:
    """Zero out prob frames whose signal energy says "this cannot be speech".

    The veto threshold is RELATIVE — ``cfg.energy_floor_db`` below the 95th
    percentile of frame energy over frames the net is confident about
    (p >= on_threshold) — so it is invariant to recording level, and only
    sustained low-energy runs (>= ``energy_veto_min_ms``) are vetoed so
    stop closures inside words survive.  Host numpy: [F]-sized arrays only.
    """
    if cfg.energy_floor_db is None:
        return probs
    probs = np.asarray(probs, np.float32)
    e = np.full(len(probs), -120.0, np.float32)
    m = min(len(probs), len(frame_energy_db))
    e[:m] = np.asarray(frame_energy_db, np.float32)[:m]
    confident = probs >= cfg.on_threshold
    if not confident.any():
        return probs
    thr = float(np.percentile(e[confident], 95.0)) + cfg.energy_floor_db
    low = e < thr
    if not low.any():
        return probs
    # keep only low-energy RUNS >= energy_veto_min_ms
    min_run = max(1, int(round(cfg.energy_veto_min_ms / cfg.hop_ms)))
    x = low.astype(np.int8)
    edges = np.flatnonzero(np.diff(np.concatenate(([0], x, [0]))))
    starts, ends = edges[::2], edges[1::2]
    out = probs.copy()
    for a, b in zip(starts, ends):
        if b - a >= min_run:
            out[a:b] = 0.0
    return out


def vad_segments_from_probs(
    probs, cfg: VadConfig | None = None, frame_energy_db=None
) -> SegmentArray:
    """probs (device or host array) -> padded speech segments.

    ``frame_energy_db``: optional [F'] per-frame signal energy (dBFS power,
    same 10 ms grid as ``probs``) enabling the energy-floor veto — see
    :func:`apply_energy_veto`."""
    cfg = cfg or VadConfig()
    if frame_energy_db is not None and cfg.energy_floor_db is not None:
        probs = apply_energy_veto(
            np.asarray(probs), np.asarray(frame_energy_db), cfg)
    mask = np.asarray(_vad_mask_jit(jnp.asarray(probs), cfg))
    return mask_to_segments_host(
        mask,
        hop_ms=cfg.hop_ms,
        min_speech_ms=cfg.min_speech_ms,
        min_gap_ms=cfg.min_silence_ms,
        speech_pad_ms=cfg.speech_pad_ms,
    )
