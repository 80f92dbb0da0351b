"""ZipEnhancer-class noise suppressor: dual-path transformer over a
compressed complex spectrogram with magnitude-mask + phase decoders.

The reference consumes ZipEnhancer as an opaque ModelScope pipeline
(``zipenhancer_pipe.py:119-125``, ``zipenhancex.py:150-156``; model
``iic/speech_zipenhancer_ans_multiloss_16k_base``, 16 kHz, dict(noisy=wav) →
wav contract).  This is a TPU-native architecture of the same family
(MP-SENet/ZipEnhancer lineage): STFT → power-law-compressed complex input →
conv encoder → N dual-path (time ↔ frequency) transformer blocks → parallel
magnitude-mask and phase decoders → iSTFT.  The wav-in/wav-out window contract
matches ``pipelines/enhance.windowed_enhance`` (2 s windows, 75 % hop).

Every attention/FFN is a large batched MXU matmul: time attention batches
B·F sequences, frequency attention batches B·T sequences (the dual-path trick
that keeps sequence lengths short and batches wide — ideal for the MXU).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import istft_ri, sqrt_hann_window, stft_ri
from .layers import conv2d_torch, conv_transpose2d_torch

Params = dict[str, Any]


def _linear(p, prefix, x):
    return x @ p[f"{prefix}.weight"].T + p[f"{prefix}.bias"]


def _layer_norm(p, prefix, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]


def _mhsa(p, prefix, x, heads):
    """Pre-LN multi-head self-attention over [N, S, C]."""
    n, s, c = x.shape
    h = _layer_norm(p, f"{prefix}.ln", x)
    qkv = _linear(p, f"{prefix}.qkv", h).reshape(n, s, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [N, S, H, Dh]
    q = jnp.transpose(q, (0, 2, 1, 3))
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))
    att = jnp.einsum("nhsd,nhtd->nhst", q, k) / np.sqrt(c // heads)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("nhst,nhtd->nhsd", att, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(n, s, c)
    return x + _linear(p, f"{prefix}.proj", out)


def _ffn(p, prefix, x):
    h = _layer_norm(p, f"{prefix}.ln", x)
    h = jax.nn.gelu(_linear(p, f"{prefix}.fc1", h))
    return x + _linear(p, f"{prefix}.fc2", h)


class ZipEnhancerModel:
    """Functional enhancer: noisy wav [B, L] -> enhanced wav [B, L] @16 kHz."""

    def __init__(
        self,
        n_fft: int = 400,
        hop: int = 100,
        channels: int = 64,
        blocks: int = 4,
        heads: int = 4,
        compress: float = 0.3,
        sample_rate: int = 16000,
    ):
        self.n_fft = n_fft
        self.hop = hop
        self.c = channels
        self.blocks = blocks
        self.heads = heads
        self.compress = compress
        self.sample_rate = sample_rate
        self.n_bins = n_fft // 2 + 1  # 201

    # ------------------------------------------------------------- init -----
    def init(self, key: jax.Array) -> Params:
        c = self.c
        p: Params = {}
        keys = iter(jax.random.split(key, 16 * self.blocks + 32))
        nk = lambda: next(keys)
        he = jax.nn.initializers.he_normal()

        def conv(prefix, c_out, c_in, kh, kw, deconv=False):
            if deconv:
                p[f"{prefix}.weight"] = he(nk(), (c_in, c_out, kh, kw))
            else:
                p[f"{prefix}.weight"] = he(nk(), (c_out, c_in, kh, kw))
            p[f"{prefix}.bias"] = jnp.zeros((c_out,))

        def linear(prefix, d_out, d_in):
            p[f"{prefix}.weight"] = he(nk(), (d_out, d_in))
            p[f"{prefix}.bias"] = jnp.zeros((d_out,))

        def ln(prefix, d):
            p[f"{prefix}.weight"] = jnp.ones((d,))
            p[f"{prefix}.bias"] = jnp.zeros((d,))

        conv("enc.conv1", c, 2, 3, 3)
        conv("enc.conv2", c, c, 1, 3)  # stride (1,2) freq downsample
        for b in range(self.blocks):
            for path in ("time", "freq"):
                ln(f"blk{b}.{path}.att.ln", c)
                linear(f"blk{b}.{path}.att.qkv", 3 * c, c)
                linear(f"blk{b}.{path}.att.proj", c, c)
                ln(f"blk{b}.{path}.ffn.ln", c)
                linear(f"blk{b}.{path}.ffn.fc1", 2 * c, c)
                linear(f"blk{b}.{path}.ffn.fc2", c, 2 * c)
        conv("mask.deconv", c, c, 1, 3, deconv=True)  # freq upsample
        conv("mask.out", 1, c, 1, 1)
        conv("phase.deconv", c, c, 1, 3, deconv=True)
        conv("phase.out_r", 1, c, 1, 1)
        conv("phase.out_i", 1, c, 1, 1)
        return p

    # ------------------------------------------------------------ apply -----
    def apply(self, p: Params, wavs: jax.Array) -> jax.Array:
        # real-pair spectra throughout: no complex HLOs, no angle/atan2 —
        # phases are carried as unit (cos, sin) pairs
        l = wavs.shape[-1]
        win = sqrt_hann_window(self.n_fft)
        spec = stft_ri(wavs, self.n_fft, self.hop, window=win)  # [B, F, T, 2]
        re, im = spec[..., 0], spec[..., 1]
        mag = jnp.sqrt(re * re + im * im + 1e-12)
        cosp, sinp = re / mag, im / mag
        mag_c = jnp.power(mag + 1e-9, self.compress)

        x = jnp.stack([mag_c * cosp, mag_c * sinp], axis=1)
        x = jnp.transpose(x, (0, 1, 3, 2))  # [B, 2, T, F]
        x = jax.nn.gelu(conv2d_torch(x, p["enc.conv1.weight"], p["enc.conv1.bias"],
                                     padding=(1, 1)))
        x = jax.nn.gelu(conv2d_torch(x, p["enc.conv2.weight"], p["enc.conv2.bias"],
                                     stride=(1, 2), padding=(0, 1)))
        b, c, t, f = x.shape

        h = jnp.transpose(x, (0, 2, 3, 1))  # [B, T, F, C]
        for blk in range(self.blocks):
            # time path: sequences over T, batched across B*F
            ht = jnp.transpose(h, (0, 2, 1, 3)).reshape(b * f, t, c)
            ht = _mhsa(p, f"blk{blk}.time.att", ht, self.heads)
            ht = _ffn(p, f"blk{blk}.time.ffn", ht)
            h = jnp.transpose(ht.reshape(b, f, t, c), (0, 2, 1, 3))
            # freq path: sequences over F, batched across B*T
            hf = h.reshape(b * t, f, c)
            hf = _mhsa(p, f"blk{blk}.freq.att", hf, self.heads)
            hf = _ffn(p, f"blk{blk}.freq.ffn", hf)
            h = hf.reshape(b, t, f, c)

        y = jnp.transpose(h, (0, 3, 1, 2))  # [B, C, T, F]

        m = conv_transpose2d_torch(y, p["mask.deconv.weight"], p["mask.deconv.bias"],
                                   stride=(1, 2), padding=(0, 1))
        m = m[..., : self.n_bins]
        m = jax.nn.gelu(m)
        mask = 2.0 * jax.nn.sigmoid(
            conv2d_torch(m, p["mask.out.weight"], p["mask.out.bias"])
        )[:, 0]  # [B, T, F]

        ph = conv_transpose2d_torch(y, p["phase.deconv.weight"], p["phase.deconv.bias"],
                                    stride=(1, 2), padding=(0, 1))
        ph = ph[..., : self.n_bins]
        ph = jax.nn.gelu(ph)
        pr = conv2d_torch(ph, p["phase.out_r.weight"], p["phase.out_r.bias"])[:, 0]
        pi = conv2d_torch(ph, p["phase.out_i.weight"], p["phase.out_i.bias"])[:, 0]
        norm = jnp.sqrt(pr * pr + pi * pi + 1e-8)
        cos_out = jnp.transpose(pr / norm, (0, 2, 1))  # [B, F, T]
        sin_out = jnp.transpose(pi / norm, (0, 2, 1))

        mag_enh = jnp.power(jnp.clip(mag_c * jnp.transpose(mask, (0, 2, 1)), 1e-9),
                            1.0 / self.compress)
        spec_enh = jnp.stack([mag_enh * cos_out, mag_enh * sin_out], axis=-1)
        return istft_ri(spec_enh, self.n_fft, self.hop, window=win, length=l)
