"""ERes2NetV2 speaker embedder (2D Res2Net with two-branch enhanced fusion).

The reference consumes this architecture only as a black-box ONNX session
(``speech_encode.py:42-60``: ``iic-speech_eres2netv2w24s4ep4...onnx`` → [B,192])
and through ModelScope (``diar_diag.py:141-157``).  This is a TPU-native
implementation of the published 3D-Speaker architecture family (w24s4ep4
configuration: base width 24, Res2Net scale 4, expansion 4): conv stem on the
[B, 1, F, T] fbank image, four Res2Net stages with stride-2 downsampling, a
bottom-up attentional feature fusion (AFF) of the last two stages, and
temporal statistics pooling → 192-d embedding.

Inference contract matches the reference wrapper: ``encode_batch`` takes raw
waveforms, computes the shared Kaldi-style fbank (``dsp/mel.py``), and returns
[B, 192] float32.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import fbank_batch
from .layers import batch_norm_apply, conv2d_torch

Params = dict[str, Any]


def _conv_bn_init(key, c_out, c_in, kh, kw):
    he = jax.nn.initializers.he_normal()
    k1, _ = jax.random.split(key)
    return {
        "w": he(k1, (c_out, c_in, kh, kw)),
        "bn_gamma": jnp.ones((c_out,)),
        "bn_beta": jnp.zeros((c_out,)),
        "bn_mean": jnp.zeros((c_out,)),
        "bn_var": jnp.ones((c_out,)),
    }


def _conv_bn(p, x, stride=(1, 1), padding=(1, 1), act=True):
    x = conv2d_torch(x, p["w"], None, stride=stride, padding=padding)
    x = batch_norm_apply(x, p["bn_mean"], p["bn_var"], p["bn_gamma"], p["bn_beta"])
    return jax.nn.relu(x) if act else x


class ERes2NetV2:
    """Functional ERes2NetV2: fbank [B, T, n_mels] -> [B, emb_dim]."""

    def __init__(
        self,
        n_mels: int = 80,
        base_width: int = 24,          # w24
        scale: int = 4,                # s4
        expansion: int = 4,            # ep4
        stage_blocks: tuple[int, ...] = (3, 4, 6, 3),
        emb_dim: int = 192,
        dtype: Any = jnp.float32,
    ):
        self.n_mels = n_mels
        self.m = base_width
        self.scale = scale
        self.exp = expansion
        self.stage_blocks = stage_blocks
        self.emb_dim = emb_dim
        self.dtype = dtype
        # stage output channels: m*exp, 2m*exp? -> classic 3D-Speaker uses
        # [m, 2m, 4m, 8m] widths with expansion on the block output
        self.widths = [self.m, 2 * self.m, 4 * self.m, 8 * self.m]

    # --------------------------------------------------------------- init ---
    def init(self, key: jax.Array) -> Params:
        keys = iter(jax.random.split(key, 512))
        nk = lambda: next(keys)
        p: Params = {"stem": _conv_bn_init(nk(), self.m, 1, 3, 3)}
        c_in = self.m
        for s, (w, n_blocks) in enumerate(zip(self.widths, self.stage_blocks)):
            c_out = w * self.exp // self.scale  # keep params modest; widths scale
            c_out = w * self.exp
            blocks = []
            for b in range(n_blocks):
                blk = {
                    "conv1": _conv_bn_init(nk(), w, c_in if b == 0 else c_out, 1, 1),
                    "convs": [
                        _conv_bn_init(nk(), w // self.scale, w // self.scale, 3, 3)
                        for _ in range(self.scale - 1)
                    ],
                    "conv3": _conv_bn_init(nk(), c_out, w, 1, 1),
                }
                if b == 0:
                    blk["down"] = _conv_bn_init(nk(), c_out, c_in, 1, 1)
                blocks.append(blk)
            p[f"stage{s}"] = blocks
            c_in = c_out
        c3 = self.widths[2] * self.exp
        c4 = self.widths[3] * self.exp
        # bottom-up fusion: project stage3 down to stage4 scale + AFF gate
        p["fuse_down"] = _conv_bn_init(nk(), c4, c3, 3, 3)
        he = jax.nn.initializers.he_normal()
        p["aff_w1"] = he(nk(), (c4 // 4, 2 * c4, 1, 1))
        p["aff_b1"] = jnp.zeros((c4 // 4,))
        p["aff_w2"] = he(nk(), (c4, c4 // 4, 1, 1))
        p["aff_b2"] = jnp.zeros((c4,))
        feat_f = self.n_mels // 8  # freq dim after 3 stride-2 stages
        p["fc_w"] = he(nk(), (self.emb_dim, c4 * feat_f * 2))
        p["fc_b"] = jnp.zeros((self.emb_dim,))
        return p

    # -------------------------------------------------------------- apply ---
    def _block(self, blk: Params, x: jax.Array, stride: tuple[int, int], first: bool):
        # downsampling happens in the leading 1x1 conv so every Res2 group
        # shares one spatial grid (the hierarchy adds groups elementwise)
        y = _conv_bn(blk["conv1"], x, stride=stride, padding=(0, 0))
        parts = jnp.split(y, self.scale, axis=1)
        outs = [parts[0]]
        prev = None
        for i in range(1, self.scale):
            inp = parts[i] if prev is None else parts[i] + prev
            prev = _conv_bn(blk["convs"][i - 1], inp, padding=(1, 1))
            outs.append(prev)
        y = jnp.concatenate(outs, axis=1)
        y = _conv_bn(blk["conv3"], y, padding=(0, 0), act=False)
        if "down" in blk:
            sc = conv2d_torch(x, blk["down"]["w"], None, stride=stride)
            sc = batch_norm_apply(sc, blk["down"]["bn_mean"], blk["down"]["bn_var"],
                                  blk["down"]["bn_gamma"], blk["down"]["bn_beta"])
        else:
            sc = x
        return jax.nn.relu(y + sc)

    def apply(self, p: Params, feats: jax.Array) -> jax.Array:
        # [B, T, M] -> [B, 1, F=M, T]
        x = jnp.transpose(feats, (0, 2, 1))[:, None].astype(self.dtype)
        x = _conv_bn(p["stem"], x, padding=(1, 1))
        stage_outs = []
        for s in range(4):
            stride = (1, 1) if s == 0 else (2, 2)
            for b, blk in enumerate(p[f"stage{s}"]):
                x = self._block(blk, x, stride if b == 0 else (1, 1), first=(b == 0))
            stage_outs.append(x)

        # bottom-up enhanced fusion of stage3 (higher res) into stage4
        s3 = _conv_bn(p["fuse_down"], stage_outs[2], stride=(2, 2), padding=(1, 1))
        s4 = stage_outs[3]
        g = jnp.concatenate([s3, s4], axis=1)
        g = jnp.mean(g, axis=(2, 3), keepdims=True)
        g = jax.nn.relu(conv2d_torch(g, p["aff_w1"], p["aff_b1"]))
        g = jax.nn.sigmoid(conv2d_torch(g, p["aff_w2"], p["aff_b2"]))
        fused = g * s3 + (1.0 - g) * s4  # [B, C4, F/8, T/8]

        # temporal statistics pooling over time, flatten channel x freq
        b, c, f, t = fused.shape
        h = fused.reshape(b, c * f, t).astype(jnp.float32)
        mu = jnp.mean(h, axis=2)
        sd = jnp.sqrt(jnp.clip(jnp.var(h, axis=2), 1e-4))
        stats = jnp.concatenate([mu, sd], axis=1)
        return (stats @ p["fc_w"].T + p["fc_b"]).astype(jnp.float32)


class ERes2NetV2Model:
    """Waveform wrapper mirroring ``eres2netv2_encode_batch``
    (``speech_encode.py:53-60``)."""

    def __init__(self, net: ERes2NetV2 | None = None, sample_rate: int = 16000):
        self.net = net or ERes2NetV2()
        self.sample_rate = sample_rate

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def encode_batch(self, params: Params, wavs: jax.Array) -> jax.Array:
        feats = fbank_batch(wavs, sample_rate=self.sample_rate, n_mels=self.net.n_mels)
        return self.net.apply(params, feats)
