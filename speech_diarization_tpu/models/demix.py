"""Dialog/effect/music demixer — time-domain U-Net (Demucs-class).

The reference ensembles three MVSEP-CDX23 Demucs checkpoints through
``demucs.apply_model`` (``dialog-demix.py:31-72``; contract: stereo 44.1 kHz
in, [3 stems, 2, T] out, ensemble mean).  This is a TPU-native separator of
the same family: a strided 1-D conv encoder with GLU activations, a dilated
residual conv bottleneck (conv instead of the BiLSTM variant — sequential
scans would serialize the TPU), and a transposed-conv decoder with skip
connections emitting all three stereo stems at once.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv1d_torch

Params = dict[str, Any]

STEMS = ("music", "effect", "dialog")


def _conv_t1d(x, w, b, stride):
    """1-D transposed conv, torch weight layout [C_in, C_out, K]."""
    c_in, c_out, k = w.shape
    wf = jnp.flip(w, axis=2)
    wf = jnp.transpose(wf, (1, 0, 2))  # [C_out, C_in, K]
    pad = k - 1
    out = jax.lax.conv_general_dilated(
        x, wf, window_strides=(1,), padding=((pad, pad),),
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


class DialogDemixer:
    """Functional separator: [B, 2, T] @44.1 kHz -> [B, 3, 2, T]."""

    def __init__(
        self,
        channels: int = 48,
        depth: int = 5,
        kernel: int = 8,
        stride: int = 4,
        bottleneck_blocks: int = 2,
        sources: int = 3,
        audio_channels: int = 2,
    ):
        self.c = channels
        self.depth = depth
        self.k = kernel
        self.s = stride
        self.nb = bottleneck_blocks
        self.sources = sources
        self.ac = audio_channels

    def valid_length(self, t: int) -> int:
        """Smallest length >= t that survives the encoder/decoder round trip."""
        for _ in range(self.depth):
            t = int(np.ceil((t - self.k) / self.s)) + 1
            t = max(t, 1)
        for _ in range(self.depth):
            t = (t - 1) * self.s + self.k
        return t

    def init(self, key: jax.Array) -> Params:
        keys = iter(jax.random.split(key, 256))
        nk = lambda: next(keys)
        he = jax.nn.initializers.he_normal()
        p: Params = {}
        c_in = self.ac
        for d in range(self.depth):
            c_out = self.c * (2 ** d)
            p[f"enc{d}_w"] = he(nk(), (c_out, c_in, self.k))
            p[f"enc{d}_b"] = jnp.zeros((c_out,))
            p[f"enc{d}_glu_w"] = he(nk(), (2 * c_out, c_out, 1))
            p[f"enc{d}_glu_b"] = jnp.zeros((2 * c_out,))
            c_in = c_out
        for i in range(self.nb):
            p[f"mid{i}_w1"] = he(nk(), (c_in, c_in, 3))
            p[f"mid{i}_b1"] = jnp.zeros((c_in,))
            p[f"mid{i}_w2"] = he(nk(), (c_in, c_in, 3))
            p[f"mid{i}_b2"] = jnp.zeros((c_in,))
        for d in reversed(range(self.depth)):
            c_out = self.ac * self.sources if d == 0 else self.c * (2 ** (d - 1))
            c_cur = self.c * (2 ** d)
            p[f"dec{d}_glu_w"] = he(nk(), (2 * c_cur, c_cur, 1))
            p[f"dec{d}_glu_b"] = jnp.zeros((2 * c_cur,))
            p[f"dec{d}_w"] = he(nk(), (c_cur, c_out, self.k)) * 0.1
            p[f"dec{d}_b"] = jnp.zeros((c_out,))
        return p

    def apply(self, p: Params, mix: jax.Array) -> jax.Array:
        b, ac, t = mix.shape
        std = jnp.std(mix, axis=(1, 2), keepdims=True) + 1e-6
        x = mix / std
        t_valid = self.valid_length(t)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_valid - t)))

        skips = []
        for d in range(self.depth):
            x = conv1d_torch(x, p[f"enc{d}_w"], p[f"enc{d}_b"], stride=self.s)
            x = jax.nn.relu(x)
            g = conv1d_torch(x, p[f"enc{d}_glu_w"], p[f"enc{d}_glu_b"])
            a, bgate = jnp.split(g, 2, axis=1)
            x = a * jax.nn.sigmoid(bgate)
            skips.append(x)

        for i in range(self.nb):
            h = jax.nn.gelu(conv1d_torch(x, p[f"mid{i}_w1"], p[f"mid{i}_b1"],
                                         padding=2 ** (i + 1), dilation=2 ** (i + 1)))
            h = conv1d_torch(h, p[f"mid{i}_w2"], p[f"mid{i}_b2"], padding=1)
            x = x + h

        for d in reversed(range(self.depth)):
            x = x + skips[d][..., : x.shape[-1]]
            g = conv1d_torch(x, p[f"dec{d}_glu_w"], p[f"dec{d}_glu_b"])
            a, bgate = jnp.split(g, 2, axis=1)
            x = a * jax.nn.sigmoid(bgate)
            x = _conv_t1d(x, p[f"dec{d}_w"], p[f"dec{d}_b"], self.s)
            if d > 0:
                x = jax.nn.relu(x)

        x = x[..., :t]
        out = x.reshape(b, self.sources, self.ac, t)
        return out * std[:, None]
