"""ECAPA-TDNN speaker embedder (SE-Res2Blocks + attentive stats pooling).

Re-implements the architecture the reference consumes through SpeechBrain
(``speech_encode.py:64-78``: ``EncoderClassifier`` over
``LanceaKing/spkrec-ecapa-cnceleb`` / ``speechbrain/spkrec-ecapa-voxceleb``,
192-d embeddings).  Architecture follows Desplanques et al. 2020 with
SpeechBrain's hyperparameters: channels [C,C,C,C,3C], Res2Net scale 8,
SE bottleneck 128, attentive statistical pooling with global context,
dilations (2,3,4) on the three SE-Res2Blocks.

TPU notes: every conv is a batched NCT conv on the MXU; the embedding batch
dimension is the dense window grid of a whole file, so a single forward pass
covers SCD + clustering + resegmentation needs (SURVEY.md §7.1 item 1).
Compute dtype is configurable (bf16 matmuls, f32 accumulation/stats).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import fbank_batch
from .layers import batch_norm_apply, conv1d_torch

Params = dict[str, Any]


def _conv_bn_init(key, c_in, c_out, k) -> Params:
    he = jax.nn.initializers.he_normal()
    kk = jax.random.split(key, 2)
    return {
        "w": he(kk[0], (c_out, c_in, k)),
        "b": jnp.zeros((c_out,)),
        "bn_gamma": jnp.ones((c_out,)),
        "bn_beta": jnp.zeros((c_out,)),
        "bn_mean": jnp.zeros((c_out,)),
        "bn_var": jnp.ones((c_out,)),
    }


def _conv_bn_apply(p: Params, x: jax.Array, dilation: int = 1, padding: int = 0,
                   groups: int = 1, act: bool = True, train: bool = False) -> jax.Array:
    """SpeechBrain TDNNBlock semantics: conv (reflect "same" padding) →
    activation → BatchNorm.  The activation-before-norm order and the reflect
    padding both matter for checkpoint parity (speechbrain.nnet.CNN.Conv1d
    defaults to padding_mode="reflect"; TDNNBlock.forward is
    norm(activation(conv(x)))."""
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)), mode="reflect")
    x = conv1d_torch(x, p["w"].astype(x.dtype), p["b"].astype(x.dtype),
                     padding=0, dilation=dilation, groups=groups)
    if act:
        x = jax.nn.relu(x)
    if train:
        # batch statistics over (batch, time); under a dp-sharded jit XLA
        # turns these reductions into cross-chip collectives automatically
        axes = (0,) + tuple(range(2, x.ndim))
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        return batch_norm_apply(x, mean, var, p["bn_gamma"], p["bn_beta"])
    return batch_norm_apply(x, p["bn_mean"], p["bn_var"], p["bn_gamma"], p["bn_beta"])


class EcapaTdnn:
    """Functional ECAPA-TDNN: fbank [B, T, n_mels] -> embeddings [B, emb_dim]."""

    def __init__(
        self,
        n_mels: int = 80,
        channels: int = 512,
        emb_dim: int = 192,
        scale: int = 8,
        se_channels: int = 128,
        att_channels: int = 128,
        dilations: tuple[int, ...] = (2, 3, 4),
        dtype: Any = jnp.float32,
    ):
        self.n_mels = n_mels
        self.channels = channels
        self.emb_dim = emb_dim
        self.scale = scale
        self.se_channels = se_channels
        self.att_channels = att_channels
        self.dilations = dilations
        self.dtype = dtype
        self.cat_channels = channels * len(dilations)  # MFA input

    # ------------------------------------------------------------- init ------
    def init(self, key: jax.Array) -> Params:
        c, s = self.channels, self.scale
        keys = iter(jax.random.split(key, 64))
        he = jax.nn.initializers.he_normal()
        params: Params = {"stem": _conv_bn_init(next(keys), self.n_mels, c, 5)}
        for i, d in enumerate(self.dilations):
            width = c // s
            block = {
                "conv1": _conv_bn_init(next(keys), c, c, 1),
                "res2": [
                    _conv_bn_init(next(keys), width, width, 3) for _ in range(s - 1)
                ],
                "conv2": _conv_bn_init(next(keys), c, c, 1),
                "se_w1": he(next(keys), (self.se_channels, c, 1)),
                "se_b1": jnp.zeros((self.se_channels,)),
                "se_w2": he(next(keys), (c, self.se_channels, 1)),
                "se_b2": jnp.zeros((c,)),
            }
            params[f"block{i}"] = block
        params["mfa"] = _conv_bn_init(next(keys), self.cat_channels, self.cat_channels, 1)
        a = self.att_channels
        cc = self.cat_channels
        params["att_w1"] = he(next(keys), (a, 3 * cc, 1))
        params["att_b1"] = jnp.zeros((a,))
        # the attention pre-projection is a full TDNNBlock in SpeechBrain
        # (conv -> ReLU -> BN) — the BN is required for checkpoint parity
        params["att_bn"] = {
            "gamma": jnp.ones((a,)),
            "beta": jnp.zeros((a,)),
            "mean": jnp.zeros((a,)),
            "var": jnp.ones((a,)),
        }
        params["att_w2"] = he(next(keys), (cc, a, 1))
        params["att_b2"] = jnp.zeros((cc,))
        params["post_bn"] = {
            "gamma": jnp.ones((2 * cc,)),
            "beta": jnp.zeros((2 * cc,)),
            "mean": jnp.zeros((2 * cc,)),
            "var": jnp.ones((2 * cc,)),
        }
        params["fc_w"] = he(next(keys), (self.emb_dim, 2 * cc, 1))
        params["fc_b"] = jnp.zeros((self.emb_dim,))
        return params

    # ------------------------------------------------------------ apply ------
    def _se_res2block(self, p: Params, x: jax.Array, dilation: int,
                      train: bool = False) -> jax.Array:
        c, s = self.channels, self.scale
        residual = x
        y = _conv_bn_apply(p["conv1"], x, padding=0, train=train)
        # Res2Net hierarchical multi-scale convs over channel groups
        groups = jnp.split(y, s, axis=1)
        outs = [groups[0]]
        prev = None
        for i in range(1, s):
            inp = groups[i] if prev is None else groups[i] + prev
            prev = _conv_bn_apply(
                p["res2"][i - 1], inp, dilation=dilation, padding=dilation,
                train=train,
            )
            outs.append(prev)
        y = jnp.concatenate(outs, axis=1)
        y = _conv_bn_apply(p["conv2"], y, padding=0, train=train)
        # squeeze-excitation
        dt = y.dtype
        zm = jnp.mean(y, axis=2, keepdims=True)  # [B, C, 1]
        z = jax.nn.relu(conv1d_torch(zm, p["se_w1"].astype(dt), p["se_b1"].astype(dt)))
        z = jax.nn.sigmoid(conv1d_torch(z, p["se_w2"].astype(dt), p["se_b2"].astype(dt)))
        return residual + y * z

    def apply(self, params: Params, feats: jax.Array, train: bool = False) -> jax.Array:
        """feats [B, T, n_mels] -> [B, emb_dim] (f32)."""
        x = jnp.transpose(feats, (0, 2, 1)).astype(self.dtype)  # [B, M, T]
        x = _conv_bn_apply(params["stem"], x, padding=2, train=train)
        block_outs = []
        for i, d in enumerate(self.dilations):
            x = self._se_res2block(params[f"block{i}"], x, d, train=train)
            block_outs.append(x)
        x = jnp.concatenate(block_outs, axis=1)  # [B, 3C, T]
        x = _conv_bn_apply(params["mfa"], x, train=train)

        # attentive statistical pooling with global context (SpeechBrain
        # AttentiveStatisticsPooling semantics: eps=1e-12, E[(x-mu)^2] form,
        # attention pre-projection is a full TDNNBlock conv->ReLU->BN)
        eps = 1e-12
        x32 = x.astype(jnp.float32)
        mu_g = jnp.mean(x32, axis=2, keepdims=True)
        sd_g = jnp.sqrt(jnp.clip(
            jnp.mean((x32 - mu_g) ** 2, axis=2, keepdims=True), eps))
        ctx = jnp.concatenate(
            [x32, jnp.broadcast_to(mu_g, x32.shape), jnp.broadcast_to(sd_g, x32.shape)],
            axis=1,
        ).astype(self.dtype)
        dt = self.dtype
        a = jax.nn.relu(conv1d_torch(ctx, params["att_w1"].astype(dt),
                                     params["att_b1"].astype(dt)))
        ab = params["att_bn"]
        if train:
            a = batch_norm_apply(
                a, jnp.mean(a.astype(jnp.float32), axis=(0, 2)),
                jnp.var(a.astype(jnp.float32), axis=(0, 2)),
                ab["gamma"], ab["beta"],
            )
        else:
            a = batch_norm_apply(a, ab["mean"], ab["var"], ab["gamma"], ab["beta"])
        a = jnp.tanh(a)
        a = conv1d_torch(a, params["att_w2"].astype(dt),
                         params["att_b2"].astype(dt)).astype(jnp.float32)
        a = jax.nn.softmax(a, axis=2)  # [B, CC, T]
        mu = jnp.sum(a * x32, axis=2)
        sd = jnp.sqrt(jnp.clip(
            jnp.sum(a * (x32 - mu[:, :, None]) ** 2, axis=2), eps))
        stats = jnp.concatenate([mu, sd], axis=1)  # [B, 2CC]

        pb = params["post_bn"]
        if train:
            stats = batch_norm_apply(
                stats, jnp.mean(stats, axis=0), jnp.var(stats, axis=0),
                pb["gamma"], pb["beta"],
            )
        else:
            stats = batch_norm_apply(stats, pb["mean"], pb["var"], pb["gamma"], pb["beta"])
        emb = conv1d_torch(stats[:, :, None], params["fc_w"], params["fc_b"])[:, :, 0]
        return emb.astype(jnp.float32)


class EcapaModel:
    """Waveform-level wrapper: [B, n_samples] -> [B, 192] embeddings.

    API analog of ``ecapa_encode_batch`` (``speech_encode.py:73-78``) — but the
    fbank frontend is fused into the same jitted graph instead of a separate
    CUDA module rebuilt per call (SURVEY.md §2.5 item 5).
    """

    def __init__(self, net: EcapaTdnn | None = None, sample_rate: int = 16000):
        self.net = net or EcapaTdnn()
        self.sample_rate = sample_rate

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def encode_batch(self, params: Params, wavs: jax.Array) -> jax.Array:
        feats = fbank_batch(wavs, sample_rate=self.sample_rate, n_mels=self.net.n_mels)
        return self.net.apply(params, feats)
