"""Neural VAD (Silero-class) + deterministic energy VAD fallback.

Replaces the Silero VAD wrapper (``vad.py:19-55``): the reference downloads an
opaque TorchScript net from torch.hub and runs it frame-by-frame in 1024-frame
batches with host↔device copies per batch (``vad.py:44-48``).

TPU-first redesign: one jitted call scores the ENTIRE file. Features are the
shared log-mel frontend at the VAD's 10 ms hop; a small causal conv + GRU stack
produces per-frame speech probabilities — sequence context like Silero's
streaming state, but evaluated in parallel over the whole grid (input
projections are hoisted matmuls; only the [B,H] recurrence scans).

The energy VAD (:func:`energy_vad_probs`) is a deterministic, training-free
fallback used by tests/benches and as a bootstrap before ported/trained
weights are loaded.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import log_mel_spectrogram
from .layers import conv1d_torch, gru_init, gru_sequence

Params = dict[str, Any]


class VadNet:
    """Functional VAD net: log-mel [B,T,M] -> speech prob [B,T].

    ``stack`` frames are processed per GRU step (inputs concatenated, ``stack``
    logits emitted): sequential scans on TPU pay wall-clock per STEP, so
    stacking cuts the VAD's scan length S-fold (measured 2.4 s -> ~0.4 s per
    600 s file on the axon chip at stack=8).  The conv frontend stays strictly
    causal per frame; within one stacked step a frame may see up to
    ``stack - 1`` future frames (<= 80 ms lookahead at stack 8) — batch VAD
    semantics, not a streaming regression, since chunk stitching already
    provides full left context (pipelines/chunking.py)."""

    def __init__(self, n_mels: int = 40, channels: int = 96, hidden: int = 96,
                 stack: int = 8):
        self.n_mels = n_mels
        self.channels = channels
        self.hidden = hidden
        self.stack = stack

    def init(self, key: jax.Array) -> Params:
        k = jax.random.split(key, 6)
        c, h, m, s = self.channels, self.hidden, self.n_mels, self.stack
        he = jax.nn.initializers.he_normal()
        return {
            "conv1_w": he(k[0], (c, m, 5)),
            "conv1_b": jnp.zeros((c,)),
            "conv2_w": he(k[1], (c, c, 3)),
            "conv2_b": jnp.zeros((c,)),
            "gru": gru_init(k[2], c * s, h),
            "out_w": he(k[3], (h, s)),
            "out_b": jnp.zeros((s,)),
        }

    def apply(self, params: Params, feats: jax.Array) -> jax.Array:
        """feats [B, T, M] -> probs [B, T]."""
        x = jnp.transpose(feats, (0, 2, 1))  # [B, M, T]
        # causal convs: left-pad only, so the prob at frame t sees only t' <= t
        x = jnp.pad(x, ((0, 0), (0, 0), (4, 0)))
        x = jax.nn.silu(conv1d_torch(x, params["conv1_w"], params["conv1_b"]))
        x = jnp.pad(x, ((0, 0), (0, 0), (4, 0)))
        x = jax.nn.silu(
            conv1d_torch(x, params["conv2_w"], params["conv2_b"], dilation=2)
        )
        x = jnp.transpose(x, (0, 2, 1))  # [B, T, C]
        b, t, c = x.shape
        s = self.stack
        t_pad = -(-t // s) * s
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        x = x.reshape(b, t_pad // s, s * c)
        y, _ = gru_sequence(x, params["gru"])  # [B, T/s, H]
        logits = y @ params["out_w"] + params["out_b"]  # [B, T/s, s]
        logits = logits.reshape(b, t_pad)[:, :t]
        return jax.nn.sigmoid(logits)


class VadConvNet:
    """Scan-free VAD: causal dilated-conv TCN, log-mel [B,T,M] -> prob [B,T].

    The GRU VadNet pays TPU wall-clock per scan STEP (~1.6 ms each on the
    axon chip — the VAD stage was 71% of the 600 s pipeline wall).  This TCN
    has no recurrence at all: a stack of causal dilated convs with residual
    connections, receptive field ``1 + (k-1)*sum(dilations)`` frames
    (~1.27 s at defaults) — comparable context to the stacked-GRU's practical
    memory, evaluated as a handful of fully-parallel MXU convs.  Same
    ``apply`` contract as :class:`VadNet`, so :class:`VadModel` and the
    chunked runner work unchanged.
    """

    def __init__(self, n_mels: int = 40, channels: int = 96,
                 dilations: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
                 kernel: int = 3):
        self.n_mels = n_mels
        self.channels = channels
        self.dilations = dilations
        self.kernel = kernel

    @property
    def receptive_field(self) -> int:
        return 1 + (self.kernel - 1) * sum(self.dilations) + 4  # + stem k5

    def init(self, key: jax.Array) -> Params:
        keys = iter(jax.random.split(key, 2 * len(self.dilations) + 4))
        he = jax.nn.initializers.he_normal()
        c, m, k = self.channels, self.n_mels, self.kernel
        p: Params = {
            "stem_w": he(next(keys), (c, m, 5)),
            "stem_b": jnp.zeros((c,)),
            "out_w": he(next(keys), (1, c, 1)),
            "out_b": jnp.zeros((1,)),
        }
        for i in range(len(self.dilations)):
            p[f"block{i}_w1"] = he(next(keys), (c, c, k))
            p[f"block{i}_b1"] = jnp.zeros((c,))
            p[f"block{i}_w2"] = he(next(keys), (c, c, 1))
            p[f"block{i}_b2"] = jnp.zeros((c,))
        return p

    def apply(self, params: Params, feats: jax.Array) -> jax.Array:
        """feats [B, T, M] -> probs [B, T]; strictly causal (left-pad only)."""
        x = jnp.transpose(feats, (0, 2, 1))  # [B, M, T]
        x = jnp.pad(x, ((0, 0), (0, 0), (4, 0)))
        x = jax.nn.silu(conv1d_torch(x, params["stem_w"], params["stem_b"]))
        k = self.kernel
        for i, d in enumerate(self.dilations):
            h = jnp.pad(x, ((0, 0), (0, 0), ((k - 1) * d, 0)))
            h = jax.nn.silu(
                conv1d_torch(h, params[f"block{i}_w1"], params[f"block{i}_b1"],
                             dilation=d))
            h = conv1d_torch(h, params[f"block{i}_w2"], params[f"block{i}_b2"])
            x = jax.nn.silu(x + h)
        logits = conv1d_torch(x, params["out_w"], params["out_b"])[:, 0, :]
        return jax.nn.sigmoid(logits)


class VadModel:
    """Waveform-level wrapper: [B, T_samples] -> per-10ms-hop probabilities.

    API analog of ``SileroVAD.probs`` (``vad.py:31-50``) but whole-file,
    single launch, no host round trips.
    """

    def __init__(self, net: VadNet | None = None, sample_rate: int = 16000,
                 hop_ms: float = 10.0, win_ms: float = 25.0):
        self.net = net or VadNet()
        self.sample_rate = sample_rate
        self.hop_ms = hop_ms
        self.win_ms = win_ms

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def probs(self, params: Params, y: jax.Array) -> jax.Array:
        """[T] or [B, T] waveform -> [.., n_frames] probs at ``hop_ms``."""
        squeeze = y.ndim == 1
        if squeeze:
            y = y[None]
        feats = log_mel_spectrogram(
            y,
            sample_rate=self.sample_rate,
            n_mels=self.net.n_mels,
            win_ms=self.win_ms,
            hop_ms=self.hop_ms,
        )
        # NB: no per-utterance mean-norm here — that global statistic would
        # break causality/streaming; inputs are loudness-normalized upstream,
        # so a fixed affine rescale suffices.
        feats = (feats + 6.0) * 0.25
        p = self.net.apply(params, feats)
        return p[0] if squeeze else p


def energy_vad_probs(
    y: jax.Array,
    sample_rate: int = 16000,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    floor_db: float = -60.0,
    dynamic_range_db: float = 30.0,
) -> jax.Array:
    """Deterministic log-energy VAD: [T] -> [n_frames] pseudo-probabilities.

    Frame log-RMS is mapped through a soft sigmoid between an adaptive noise
    floor (20th percentile) and floor+dynamic_range.  No learned weights; used
    as the bootstrap backend and in integration tests where ground truth is
    synthetic silence/tone alternation.
    """
    from ..dsp.framing import frame_signal

    win = int(sample_rate * win_ms / 1000.0)
    hop = int(sample_rate * hop_ms / 1000.0)
    frames = frame_signal(y, win, hop)  # [.., n, win]
    rms_db = 10.0 * jnp.log10(jnp.mean(frames * frames, axis=-1) + 1e-10)
    rms_db = jnp.maximum(rms_db, floor_db)
    # sort-free noise-floor estimate (percentile would need a sort lowering,
    # missing on the axon TPU backend): mean of the below-average frames,
    # computed per utterance when batched
    mean_db = jnp.mean(rms_db, axis=-1, keepdims=True)
    low = rms_db <= mean_db
    noise_floor = (
        jnp.sum(jnp.where(low, rms_db, 0.0), axis=-1, keepdims=True)
        / jnp.maximum(jnp.sum(low, axis=-1, keepdims=True), 1)
    )
    lo = jnp.maximum(noise_floor + 9.0, floor_db + 3.0)
    z = (rms_db - lo) / (dynamic_range_db / 10.0)
    return jax.nn.sigmoid(z)
