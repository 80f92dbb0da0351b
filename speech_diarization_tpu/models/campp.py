"""CAM++ speaker embedder — faithful to the published 3D-Speaker CAMPPlus.

The reference reaches CAM++ as a ModelScope ONNX backend
(``diar_diag.py:141-157``: ``iic/speech_campplus_sv_zh-cn_16k-common``,
192-d).  This implementation mirrors the 3D-Speaker ``CAMPPlus`` module graph
exactly — parameters are a FLAT dict keyed by the torch ``state_dict`` names
(the ``models/gtcrn.py`` approach), so porting a checkpoint (torch state_dict
or ONNX initializers) is a pure relabel.

Architecture (sv_zh-cn_16k-common config: growth 32, bn 128, init 128,
blocks 12/24/16 at dilations 1/2/2, emb 192 — ~7.2M params):
  head  = FCM: conv/bn stem + two stride-2-in-freq residual stages + one more
          freq-stride conv → [B, 32·F/8, T]
  xvector.tdnn       = TDNNLayer k5 stride2 (time) + BN-ReLU
  xvector.block{1-3} = CAMDenseTDNNBlock: dense layers, each
          BN-ReLU → 1x1 bottleneck → BN-ReLU → CAMLayer (local conv gated by
          sigmoid MLP over global-mean + 100-frame average segment context)
  xvector.transit{1-3} = BN-ReLU → 1x1 conv (halve channels)
  xvector.out_nonlinear = BN-ReLU
  xvector.stats      = mean ++ unbiased-std over time
  xvector.dense      = 1x1 linear → affine-less BatchNorm

TPU notes: all 1-D convs are MXU matmuls over the dense window-grid batch;
the CAM segment pooling is a reshape-mean (static shapes); compute dtype is
configurable (bf16 matmuls, f32 stats).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import fbank_batch
from .layers import batch_norm_apply, conv1d_torch, conv2d_torch

Params = dict[str, jax.Array]


class CamPlusPlus:
    """Functional CAM++: fbank [B, T, n_mels] -> [B, emb_dim].

    Parameter dict keys == torch ``state_dict()`` keys of 3D-Speaker
    ``CAMPPlus`` (``head.conv1.weight``, ``xvector.block1.tdnnd1...``, ...).
    """

    def __init__(
        self,
        n_mels: int = 80,
        m_channels: int = 32,          # FCM channels
        init_channels: int = 128,
        growth: int = 32,
        bn_channels: int = 128,
        num_layers: tuple[int, ...] = (12, 24, 16),
        dilations: tuple[int, ...] = (1, 2, 2),
        kernels: tuple[int, ...] = (3, 3, 3),
        emb_dim: int = 192,
        seg_len: int = 100,
        dtype: Any = jnp.float32,
    ):
        self.n_mels = n_mels
        self.m = m_channels
        self.init_c = init_channels
        self.growth = growth
        self.bn_c = bn_channels
        self.num_layers = num_layers
        self.dilations = dilations
        self.kernels = kernels
        self.emb_dim = emb_dim
        self.seg_len = seg_len
        self.dtype = dtype
        self.head_out = m_channels * (n_mels // 8)

    # ----------------------------------------------------------- manifest ---
    def manifest(self) -> dict[str, tuple[int, ...]]:
        man: dict[str, tuple[int, ...]] = {}

        def bn(prefix, c, affine=True):
            if affine:
                man[f"{prefix}.weight"] = (c,)
                man[f"{prefix}.bias"] = (c,)
            man[f"{prefix}.running_mean"] = (c,)
            man[f"{prefix}.running_var"] = (c,)

        # FCM head
        m = self.m
        man["head.conv1.weight"] = (m, 1, 3, 3)
        bn("head.bn1", m)
        for li in (1, 2):
            for b in range(2):
                pre = f"head.layer{li}.{b}"
                man[f"{pre}.conv1.weight"] = (m, m, 3, 3)
                bn(f"{pre}.bn1", m)
                man[f"{pre}.conv2.weight"] = (m, m, 3, 3)
                bn(f"{pre}.bn2", m)
                if b == 0:  # stride-2 block: projection shortcut
                    man[f"{pre}.shortcut.0.weight"] = (m, m, 1, 1)
                    bn(f"{pre}.shortcut.1", m)
        man["head.conv2.weight"] = (m, m, 3, 3)
        bn("head.bn2", m)

        # xvector
        man["xvector.tdnn.linear.weight"] = (self.init_c, self.head_out, 5)
        man["xvector.tdnn.linear.bias"] = (self.init_c,)
        bn("xvector.tdnn.nonlinear.batchnorm", self.init_c)
        c = self.init_c
        for bi, (n, k) in enumerate(zip(self.num_layers, self.kernels)):
            for li in range(n):
                cin = c + li * self.growth
                pre = f"xvector.block{bi + 1}.tdnnd{li + 1}"
                bn(f"{pre}.nonlinear1.batchnorm", cin)
                man[f"{pre}.linear1.weight"] = (self.bn_c, cin, 1)
                bn(f"{pre}.nonlinear2.batchnorm", self.bn_c)
                man[f"{pre}.cam_layer.linear_local.weight"] = (self.growth, self.bn_c, k)
                man[f"{pre}.cam_layer.linear1.weight"] = (self.bn_c // 2, self.bn_c, 1)
                man[f"{pre}.cam_layer.linear1.bias"] = (self.bn_c // 2,)
                man[f"{pre}.cam_layer.linear2.weight"] = (self.growth, self.bn_c // 2, 1)
                man[f"{pre}.cam_layer.linear2.bias"] = (self.growth,)
            c += n * self.growth
            bn(f"xvector.transit{bi + 1}.nonlinear.batchnorm", c)
            man[f"xvector.transit{bi + 1}.linear.weight"] = (c // 2, c, 1)
            c //= 2
        bn("xvector.out_nonlinear.batchnorm", c)
        man["xvector.dense.linear.weight"] = (self.emb_dim, 2 * c, 1)
        bn("xvector.dense.nonlinear.batchnorm", self.emb_dim, affine=False)
        return man

    # --------------------------------------------------------------- init ---
    def init(self, key: jax.Array) -> Params:
        man = self.manifest()
        keys = jax.random.split(key, len(man))
        he = jax.nn.initializers.he_normal()
        params: Params = {}
        for (k, shape), kk in zip(man.items(), keys):
            if k.endswith("running_var") or (k.endswith("weight") and len(shape) == 1):
                params[k] = jnp.ones(shape)
            elif k.endswith(("bias", "running_mean")):
                params[k] = jnp.zeros(shape)
            else:
                params[k] = he(kk, shape)
        return params

    # -------------------------------------------------------------- apply ---
    def _bn_relu(self, p: Params, prefix: str, x: jax.Array, relu: bool = True,
                 affine: bool = True) -> jax.Array:
        gamma = p.get(f"{prefix}.weight")
        beta = p.get(f"{prefix}.bias")
        if gamma is None:
            gamma = jnp.ones_like(p[f"{prefix}.running_var"])
            beta = jnp.zeros_like(gamma)
        x = batch_norm_apply(x, p[f"{prefix}.running_mean"],
                             p[f"{prefix}.running_var"], gamma, beta)
        return jax.nn.relu(x) if relu else x

    def _res_block(self, p: Params, pre: str, x: jax.Array, stride: int) -> jax.Array:
        dt = x.dtype
        out = conv2d_torch(x, p[f"{pre}.conv1.weight"].astype(dt), None,
                           stride=(stride, 1), padding=(1, 1))
        out = jax.nn.relu(self._bn_relu(p, f"{pre}.bn1", out, relu=False))
        out = conv2d_torch(out, p[f"{pre}.conv2.weight"].astype(dt), None,
                           padding=(1, 1))
        out = self._bn_relu(p, f"{pre}.bn2", out, relu=False)
        if f"{pre}.shortcut.0.weight" in p:
            res = conv2d_torch(x, p[f"{pre}.shortcut.0.weight"].astype(dt), None,
                               stride=(stride, 1))
            res = self._bn_relu(p, f"{pre}.shortcut.1", res, relu=False)
        else:
            res = x
        return jax.nn.relu(out + res)

    def _seg_pool(self, x: jax.Array) -> jax.Array:
        """100-frame average pooling, each segment's mean broadcast back over
        its frames (ceil mode; ragged tail averaged over its true length)."""
        b, c, t = x.shape
        n_seg = -(-t // self.seg_len)
        pad = n_seg * self.seg_len - t
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        valid = jnp.pad(jnp.ones((t,), x.dtype), (0, pad)).reshape(n_seg, self.seg_len)
        seg = xp.reshape(b, c, n_seg, self.seg_len)
        mean = seg.sum(axis=3) / jnp.maximum(valid.sum(axis=1), 1.0)
        out = jnp.repeat(mean, self.seg_len, axis=2)
        return out[:, :, :t]

    def _cam_layer(self, p: Params, pre: str, x: jax.Array, k: int, dilation: int) -> jax.Array:
        dt = x.dtype
        pad = (k - 1) // 2 * dilation
        y = conv1d_torch(x, p[f"{pre}.linear_local.weight"].astype(dt), None,
                         padding=pad, dilation=dilation)
        context = jnp.mean(x, axis=2, keepdims=True) + self._seg_pool(x)
        g = jax.nn.relu(conv1d_torch(context, p[f"{pre}.linear1.weight"].astype(dt),
                                     p[f"{pre}.linear1.bias"].astype(dt)))
        m = jax.nn.sigmoid(conv1d_torch(g, p[f"{pre}.linear2.weight"].astype(dt),
                                        p[f"{pre}.linear2.bias"].astype(dt)))
        return y * m

    def apply(self, p: Params, feats: jax.Array) -> jax.Array:
        # [B, T, M] -> [B, 1, F=M, T]
        x = jnp.transpose(feats, (0, 2, 1))[:, None].astype(self.dtype)
        dt = x.dtype
        x = conv2d_torch(x, p["head.conv1.weight"].astype(dt), None, padding=(1, 1))
        x = self._bn_relu(p, "head.bn1", x)
        for li in (1, 2):
            for b in range(2):
                x = self._res_block(p, f"head.layer{li}.{b}", x, 2 if b == 0 else 1)
        x = conv2d_torch(x, p["head.conv2.weight"].astype(dt), None,
                         stride=(2, 1), padding=(1, 1))
        x = self._bn_relu(p, "head.bn2", x)
        b, c, f, t = x.shape
        x = x.reshape(b, c * f, t)

        # xvector.tdnn: k5 stride-2 conv + BN-ReLU
        x = conv1d_torch(x, p["xvector.tdnn.linear.weight"].astype(dt),
                         p["xvector.tdnn.linear.bias"].astype(dt),
                         stride=2, padding=2)
        x = self._bn_relu(p, "xvector.tdnn.nonlinear.batchnorm", x)

        for bi, (n, k, d) in enumerate(zip(self.num_layers, self.kernels, self.dilations)):
            for li in range(n):
                pre = f"xvector.block{bi + 1}.tdnnd{li + 1}"
                h = self._bn_relu(p, f"{pre}.nonlinear1.batchnorm", x)
                h = conv1d_torch(h, p[f"{pre}.linear1.weight"].astype(dt), None)
                h = self._bn_relu(p, f"{pre}.nonlinear2.batchnorm", h)
                h = self._cam_layer(p, f"{pre}.cam_layer", h, k, d)
                x = jnp.concatenate([x, h], axis=1)
            pre = f"xvector.transit{bi + 1}"
            x = self._bn_relu(p, f"{pre}.nonlinear.batchnorm", x)
            x = conv1d_torch(x, p[f"{pre}.linear.weight"].astype(dt), None)
        x = self._bn_relu(p, "xvector.out_nonlinear.batchnorm", x)

        # stats pooling: mean ++ unbiased std over time
        h = x.astype(jnp.float32)
        t = h.shape[2]
        mu = jnp.mean(h, axis=2)
        var = jnp.var(h, axis=2) * (t / max(t - 1, 1))
        stats = jnp.concatenate([mu, jnp.sqrt(var)], axis=1)

        emb = conv1d_torch(stats[:, :, None],
                           p["xvector.dense.linear.weight"].astype(jnp.float32),
                           None)[:, :, 0]
        emb = self._bn_relu(p, "xvector.dense.nonlinear.batchnorm",
                            emb, relu=False, affine=False)
        return emb.astype(jnp.float32)


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


def load_campp(src, net: CamPlusPlus | None = None, strict: bool = True) -> Params:
    """Port a 3D-Speaker CAMPPlus checkpoint (torch state_dict, checkpoint
    path, or ONNX path — initializers keep the torch names) into our flat
    param dict, with shape assertions against the manifest."""
    from pathlib import Path

    if isinstance(src, (str, Path)):
        path = Path(src)
        if path.suffix == ".onnx":
            from .eres2netv2 import onnx_initializers

            src = onnx_initializers(path)
        else:
            import torch

            ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
            src = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt

    net = net or CamPlusPlus()
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
