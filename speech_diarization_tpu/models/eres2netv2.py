"""ERes2NetV2 speaker embedder — faithful to the published 3D-Speaker net.

The reference consumes this architecture as a black-box ONNX session
(``speech_encode.py:42-60``: ``iic-speech_eres2netv2w24s4ep4...onnx`` → [B,192])
and through ModelScope (``diar_diag.py:141-157``).  This implementation mirrors
the 3D-Speaker ``ERes2NetV2`` module graph exactly — parameters are a FLAT
dict keyed by the torch ``state_dict`` names (the ``models/gtcrn.py``
approach), so porting a checkpoint (torch state_dict or ONNX initializers,
which keep the same names) is a pure relabel through ``models/port.py``.

Architecture (w24s4ep4 = baseWidth 24, scale 4, expansion 4; m_channels 32):
  conv1/bn1 stem on the [B, 1, F, T] fbank image
  layer1/2: BasicBlockERes2NetV2   (Res2-style hierarchy, sp = sp + spx[i])
  layer3/4: BasicBlockERes2NetV2AFF (hierarchy fused by AFF gates)
  layer3_ds: stride-2 3x3 conv projecting layer3 to layer4 scale
  fuse34: AFF(out4, out3_ds)
  TSTP pooling (mean ++ std over time of the [B, C*F, T] map) → seg_1 Linear

Block structure (BasicBlockERes2NetV2):
  conv1 1x1 (carries the stride) → bn1 → relu
  split into `scale` groups of `width`; for i>0 the running feature is added
  (plain) or AFF-fused (AFF variant) into group i; each group: 3x3 conv →
  bn → relu; concat
  conv3 1x1 → bn3; residual (shortcut = 1x1 conv + bn when shape changes);
  relu

AFF gate: att = 1 + tanh(BN(conv(SiLU(BN(conv(cat(x, ds_y)))))));
          out = x * att + ds_y * (2 - att).

TPU notes: all convs are NCHW images on the MXU; the batch dimension is the
dense window grid of a whole file (SURVEY.md §7.1 item 1); compute dtype is
configurable (bf16 matmuls, f32 pooling).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import fbank_batch
from .layers import batch_norm_apply, conv2d_torch

Params = dict[str, jax.Array]


def _he(key, shape):
    return jax.nn.initializers.he_normal()(key, shape)


class ERes2NetV2:
    """Functional ERes2NetV2: fbank [B, T, n_mels] -> [B, emb_dim].

    Parameter dict keys == torch ``state_dict()`` keys of the 3D-Speaker
    module (``conv1.weight``, ``layer1.0.conv1.weight``, ``fuse34.local_att.0.weight``,
    ``seg_1.weight``, ...).
    """

    def __init__(
        self,
        n_mels: int = 80,
        m_channels: int = 32,
        base_width: int = 24,          # w24
        scale: int = 4,                # s4
        expansion: int = 4,            # ep4
        num_blocks: tuple[int, ...] = (3, 4, 6, 3),
        emb_dim: int = 192,
        dtype: Any = jnp.float32,
    ):
        self.n_mels = n_mels
        self.m = m_channels
        self.base_width = base_width
        self.scale = scale
        self.exp = expansion
        self.num_blocks = num_blocks
        self.emb_dim = emb_dim
        self.dtype = dtype
        self.planes = [m_channels, 2 * m_channels, 4 * m_channels, 8 * m_channels]

    def _width(self, planes: int) -> int:
        return int(math.floor(planes * (self.base_width / 64.0)))

    # ----------------------------------------------------------- manifest ---
    def manifest(self) -> dict[str, tuple[int, ...]]:
        """Expected state_dict key -> shape (the checkpoint contract)."""
        man: dict[str, tuple[int, ...]] = {}

        def bn(prefix, c):
            for s in ("weight", "bias", "running_mean", "running_var"):
                man[f"{prefix}.{s}"] = (c,)

        def aff(prefix, channels):
            inter = channels // 4
            man[f"{prefix}.local_att.0.weight"] = (inter, 2 * channels, 1, 1)
            man[f"{prefix}.local_att.0.bias"] = (inter,)
            bn(f"{prefix}.local_att.1", inter)
            man[f"{prefix}.local_att.3.weight"] = (channels, inter, 1, 1)
            man[f"{prefix}.local_att.3.bias"] = (channels,)
            bn(f"{prefix}.local_att.4", channels)

        man["conv1.weight"] = (self.m, 1, 3, 3)
        bn("bn1", self.m)
        in_planes = self.m
        for li, (planes, n_blocks) in enumerate(zip(self.planes, self.num_blocks)):
            stride = 1 if li == 0 else 2
            width = self._width(planes)
            fuse = li >= 2
            for b in range(n_blocks):
                pre = f"layer{li + 1}.{b}"
                s = stride if b == 0 else 1
                man[f"{pre}.conv1.weight"] = (width * self.scale, in_planes, 1, 1)
                bn(f"{pre}.bn1", width * self.scale)
                for i in range(self.scale):
                    man[f"{pre}.convs.{i}.weight"] = (width, width, 3, 3)
                    bn(f"{pre}.bns.{i}", width)
                if fuse:
                    for i in range(self.scale - 1):
                        aff(f"{pre}.fuse_models.{i}", width)
                man[f"{pre}.conv3.weight"] = (planes * self.exp, width * self.scale, 1, 1)
                bn(f"{pre}.bn3", planes * self.exp)
                if s != 1 or in_planes != planes * self.exp:
                    man[f"{pre}.shortcut.0.weight"] = (planes * self.exp, in_planes, 1, 1)
                    bn(f"{pre}.shortcut.1", planes * self.exp)
                in_planes = planes * self.exp
        c3 = self.planes[2] * self.exp
        c4 = self.planes[3] * self.exp
        man["layer3_ds.weight"] = (c4, c3, 3, 3)
        aff("fuse34", c4)
        feat_f = self.n_mels // 8
        man["seg_1.weight"] = (self.emb_dim, c4 * feat_f * 2)
        man["seg_1.bias"] = (self.emb_dim,)
        return man

    # --------------------------------------------------------------- init ---
    def init(self, key: jax.Array) -> Params:
        man = self.manifest()
        keys = jax.random.split(key, len(man))
        params: Params = {}
        for (k, shape), kk in zip(man.items(), keys):
            if k.endswith("running_var") or (k.endswith("weight") and len(shape) == 1):
                params[k] = jnp.ones(shape)      # BN gamma / running_var
            elif k.endswith(("bias", "running_mean")):
                params[k] = jnp.zeros(shape)
            else:
                params[k] = _he(kk, shape)
        return params

    # -------------------------------------------------------------- apply ---
    def _bn(self, p: Params, prefix: str, x: jax.Array) -> jax.Array:
        return batch_norm_apply(
            x, p[f"{prefix}.running_mean"], p[f"{prefix}.running_var"],
            p[f"{prefix}.weight"], p[f"{prefix}.bias"],
        )

    def _aff(self, p: Params, prefix: str, x: jax.Array, ds_y: jax.Array) -> jax.Array:
        dt = x.dtype
        xa = jnp.concatenate([x, ds_y], axis=1)
        h = conv2d_torch(xa, p[f"{prefix}.local_att.0.weight"].astype(dt),
                         p[f"{prefix}.local_att.0.bias"].astype(dt))
        h = self._bn(p, f"{prefix}.local_att.1", h)
        h = jax.nn.silu(h)
        h = conv2d_torch(h, p[f"{prefix}.local_att.3.weight"].astype(dt),
                         p[f"{prefix}.local_att.3.bias"].astype(dt))
        h = self._bn(p, f"{prefix}.local_att.4", h)
        att = 1.0 + jnp.tanh(h)
        return x * att + ds_y * (2.0 - att)

    def _block(self, p: Params, pre: str, x: jax.Array, stride: int, fuse: bool) -> jax.Array:
        dt = x.dtype
        out = conv2d_torch(x, p[f"{pre}.conv1.weight"].astype(dt), None,
                           stride=(stride, stride))
        out = jax.nn.relu(self._bn(p, f"{pre}.bn1", out))
        spx = jnp.split(out, self.scale, axis=1)
        outs = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = spx[i]
            elif fuse:
                sp = self._aff(p, f"{pre}.fuse_models.{i - 1}", sp, spx[i])
            else:
                sp = sp + spx[i]
            sp = conv2d_torch(sp, p[f"{pre}.convs.{i}.weight"].astype(dt), None,
                              padding=(1, 1))
            sp = jax.nn.relu(self._bn(p, f"{pre}.bns.{i}", sp))
            outs.append(sp)
        out = jnp.concatenate(outs, axis=1)
        out = self._bn(p, f"{pre}.bn3",
                       conv2d_torch(out, p[f"{pre}.conv3.weight"].astype(dt), None))
        if f"{pre}.shortcut.0.weight" in p:
            res = conv2d_torch(x, p[f"{pre}.shortcut.0.weight"].astype(dt), None,
                               stride=(stride, stride))
            res = self._bn(p, f"{pre}.shortcut.1", res)
        else:
            res = x
        return jax.nn.relu(out + res)

    def apply(self, p: Params, feats: jax.Array) -> jax.Array:
        # [B, T, M] -> [B, 1, F=M, T]
        x = jnp.transpose(feats, (0, 2, 1))[:, None].astype(self.dtype)
        x = conv2d_torch(x, p["conv1.weight"].astype(x.dtype), None, padding=(1, 1))
        x = jax.nn.relu(self._bn(p, "bn1", x))
        outs = []
        for li, n_blocks in enumerate(self.num_blocks):
            stride = 1 if li == 0 else 2
            fuse = li >= 2
            for b in range(n_blocks):
                x = self._block(p, f"layer{li + 1}.{b}", x,
                                stride if b == 0 else 1, fuse)
            outs.append(x)

        out3_ds = conv2d_torch(outs[2], p["layer3_ds.weight"].astype(x.dtype), None,
                               stride=(2, 2), padding=(1, 1))
        fused = self._aff(p, "fuse34", outs[3], out3_ds)

        # TSTP: mean ++ std over time of [B, C*F, T] (unbiased var + 1e-7,
        # matching wespeaker/3D-Speaker pooling_layers.TSTP)
        b, c, f, t = fused.shape
        h = fused.reshape(b, c * f, t).astype(jnp.float32)
        mu = jnp.mean(h, axis=2)
        var = jnp.var(h, axis=2) * (t / max(t - 1, 1))
        sd = jnp.sqrt(var + 1e-7)
        stats = jnp.concatenate([mu, sd], axis=1)
        emb = stats @ p["seg_1.weight"].T + p["seg_1.bias"]
        return emb.astype(jnp.float32)


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


def load_eres2netv2(src, net: ERes2NetV2 | None = None, strict: bool = True) -> Params:
    """Port a 3D-Speaker ERes2NetV2 checkpoint into our flat param dict.

    ``src``: a torch state_dict / plain mapping of arrays (keys are already
    ours), a ``.onnx`` path (initializers keep the torch names), or a torch
    checkpoint path.
    """
    from pathlib import Path

    if isinstance(src, (str, Path)):
        path = Path(src)
        if path.suffix == ".onnx":
            src = onnx_initializers(path)
        else:
            import torch

            ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
            src = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt

    net = net or ERes2NetV2()
    sd: Params = {}
    for k, v in src.items():
        if k.endswith("num_batches_tracked"):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = jnp.asarray(np.asarray(v, dtype=np.float32))

    man = net.manifest()
    if strict:
        missing = sorted(set(man) - set(sd))
        extra = sorted(set(sd) - set(man))
        if missing or extra:
            raise ValueError(
                f"state_dict schema mismatch: missing={missing[:5]} "
                f"({len(missing)} total), unexpected={extra[:5]} ({len(extra)} total)"
            )
        for k, shape in man.items():
            if tuple(sd[k].shape) != shape:
                raise ValueError(f"{k}: expected {shape}, got {tuple(sd[k].shape)}")
    return sd


def onnx_initializers(path) -> dict[str, np.ndarray]:
    """Extract named initializers from an ONNX graph (torch exports keep the
    original parameter names for weights).

    Uses the ``onnx`` package when present; otherwise falls back to the
    self-contained protobuf-subset reader (``io/onnx_lite.py``) so the
    ERes2NetV2/CAM++ artifact path works in images without onnx installed.
    """
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        from ..io.onnx_lite import read_initializers

        return read_initializers(path)

    model = onnx.load(str(path))
    return {i.name: numpy_helper.to_array(i) for i in model.graph.initializer}
