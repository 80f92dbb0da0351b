"""CAM++ speaker embedder (D-TDNN with context-aware masking).

The reference reaches CAM++ only as a ModelScope ONNX backend
(``diar_diag.py:141-157``: ``iic/speech_campplus_sv_zh-cn_16k-common``).
TPU-native implementation of the published architecture family: a 2-D
front-end convolution module (FCM) that downsamples frequency, a densely
connected TDNN backbone (D-TDNN blocks with bottleneck growth), context-aware
mask (CAM) modules that gate features with pooled segment context, and
statistics pooling → 192-d embedding.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import fbank_batch
from .layers import batch_norm_apply, conv1d_torch, conv2d_torch

Params = dict[str, Any]


def _bn1d_init(c):
    return {
        "bn_gamma": jnp.ones((c,)),
        "bn_beta": jnp.zeros((c,)),
        "bn_mean": jnp.zeros((c,)),
        "bn_var": jnp.ones((c,)),
    }


def _bn(p, x):
    return batch_norm_apply(x, p["bn_mean"], p["bn_var"], p["bn_gamma"], p["bn_beta"])


class CamPlusPlus:
    """Functional CAM++: fbank [B, T, n_mels] -> [B, emb_dim]."""

    def __init__(
        self,
        n_mels: int = 80,
        fcm_channels: int = 32,
        init_channels: int = 128,
        growth: int = 64,
        bottleneck: int = 128,
        blocks: tuple[int, ...] = (4, 6, 8),
        emb_dim: int = 192,
        dtype: Any = jnp.float32,
    ):
        self.n_mels = n_mels
        self.fcm_c = fcm_channels
        self.init_c = init_channels
        self.growth = growth
        self.bottleneck = bottleneck
        self.blocks = blocks
        self.emb_dim = emb_dim
        self.dtype = dtype

    def init(self, key: jax.Array) -> Params:
        keys = iter(jax.random.split(key, 1024))
        nk = lambda: next(keys)
        he = jax.nn.initializers.he_normal()
        p: Params = {}

        # FCM: two stride-2-in-freq 2D convs on [B, 1, F, T]
        p["fcm1_w"] = he(nk(), (self.fcm_c, 1, 3, 3))
        p["fcm1"] = _bn1d_init(self.fcm_c)
        p["fcm2_w"] = he(nk(), (self.fcm_c, self.fcm_c, 3, 3))
        p["fcm2"] = _bn1d_init(self.fcm_c)

        fcm_out = self.fcm_c * (self.n_mels // 4)  # channels x F/4 flattened
        p["stem_w"] = he(nk(), (self.init_c, fcm_out, 5))
        p["stem_b"] = jnp.zeros((self.init_c,))
        p["stem_bn"] = _bn1d_init(self.init_c)

        c = self.init_c
        for bi, n_layers in enumerate(self.blocks):
            layers = []
            for li in range(n_layers):
                layers.append({
                    "bn1": _bn1d_init(c),
                    "w1": he(nk(), (self.bottleneck, c, 1)),
                    "bn2": _bn1d_init(self.bottleneck),
                    "w2": he(nk(), (self.growth, self.bottleneck, 3)),
                    # CAM gate: pooled context -> bottleneck -> growth sigmoid
                    "cam_w1": he(nk(), (self.bottleneck // 2, self.growth)),
                    "cam_b1": jnp.zeros((self.bottleneck // 2,)),
                    "cam_w2": he(nk(), (self.growth, self.bottleneck // 2)),
                    "cam_b2": jnp.zeros((self.growth,)),
                })
                c += self.growth
            p[f"block{bi}"] = layers
            # transition: 1x1 halving
            p[f"trans{bi}_bn"] = _bn1d_init(c)
            p[f"trans{bi}_w"] = he(nk(), (c // 2, c, 1))
            c = c // 2

        p["out_bn"] = _bn1d_init(c)
        p["fc_w"] = he(nk(), (self.emb_dim, 2 * c))
        p["fc_b"] = jnp.zeros((self.emb_dim,))
        self._final_c = c
        return p

    def _dtdnn_layer(self, lp: Params, x: jax.Array, dilation: int) -> jax.Array:
        """Dense layer: BN-ReLU-1x1 -> BN-ReLU-3x1(dilated) -> CAM gate; the
        output is concatenated onto the running feature map."""
        h = jax.nn.relu(_bn(lp["bn1"], x))
        h = conv1d_torch(h, lp["w1"])
        h = jax.nn.relu(_bn(lp["bn2"], h))
        h = conv1d_torch(h, lp["w2"], padding=dilation, dilation=dilation)
        # context-aware mask: segment-pooled stats gate the new features
        ctx = jnp.mean(h.astype(jnp.float32), axis=2)  # [B, growth]
        g = jax.nn.relu(ctx @ lp["cam_w1"].T + lp["cam_b1"])
        g = jax.nn.sigmoid(g @ lp["cam_w2"].T + lp["cam_b2"])  # [B, growth]
        h = h * g[:, :, None].astype(h.dtype)
        return jnp.concatenate([x, h], axis=1)

    def apply(self, p: Params, feats: jax.Array) -> jax.Array:
        # [B, T, M] -> [B, 1, F, T]
        x = jnp.transpose(feats, (0, 2, 1))[:, None].astype(self.dtype)
        x = conv2d_torch(x, p["fcm1_w"], None, stride=(2, 1), padding=(1, 1))
        x = jax.nn.relu(_bn(p["fcm1"], x))
        x = conv2d_torch(x, p["fcm2_w"], None, stride=(2, 1), padding=(1, 1))
        x = jax.nn.relu(_bn(p["fcm2"], x))
        b, c, f, t = x.shape
        x = x.reshape(b, c * f, t)

        x = conv1d_torch(x, p["stem_w"], p["stem_b"], padding=2)
        x = jax.nn.relu(_bn(p["stem_bn"], x))

        for bi, n_layers in enumerate(self.blocks):
            dilation = (1, 2, 3)[bi % 3]
            for lp in p[f"block{bi}"]:
                x = self._dtdnn_layer(lp, x, dilation)
            x = jax.nn.relu(_bn(p[f"trans{bi}_bn"], x))
            x = conv1d_torch(x, p[f"trans{bi}_w"])

        x = jax.nn.relu(_bn(p["out_bn"], x)).astype(jnp.float32)
        mu = jnp.mean(x, axis=2)
        sd = jnp.sqrt(jnp.clip(jnp.var(x, axis=2), 1e-4))
        stats = jnp.concatenate([mu, sd], axis=1)
        return (stats @ p["fc_w"].T + p["fc_b"]).astype(jnp.float32)


class CamPlusPlusModel:
    """Waveform wrapper (ModelScope-backend analog of ``diar_diag.py:161-177``)."""

    def __init__(self, net: CamPlusPlus | None = None, sample_rate: int = 16000):
        self.net = net or CamPlusPlus()
        self.sample_rate = sample_rate

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def encode_batch(self, params: Params, wavs: jax.Array) -> jax.Array:
        feats = fbank_batch(wavs, sample_rate=self.sample_rate, n_mels=self.net.n_mels)
        return self.net.apply(params, feats)
