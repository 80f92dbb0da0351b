"""NN primitives with torch-compatible semantics and weight layouts.

Why torch layouts?  The reference's checkpoints (GTCRN DNS3 tar at
``gtcrn_wrap.py:157``, SpeechBrain ECAPA, ONNX ERes2NetV2 — SURVEY.md §2.4)
are torch/ONNX state dicts.  Keeping our parameter trees bit-compatible with
those layouts makes weight porting a pure ``jnp.asarray`` relabeling
(``models/port.py``) and lets golden tests compare activations layer by layer.

Everything here is a pure function over explicit parameter pytrees (functional
style — no module state), jit/vmap/scan-friendly, and lowered by XLA to MXU
convs/matmuls.  bf16 compute with f32 accumulation is opt-in via the ``dtype``
arguments; parameters stay f32.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- convs ------
def conv1d_torch(
    x: jax.Array,  # [B, C_in, T]
    weight: jax.Array,  # [C_out, C_in/groups, K]
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """``torch.nn.functional.conv1d`` semantics (cross-correlation)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv2d_torch(
    x: jax.Array,  # [B, C_in, H, W]
    weight: jax.Array,  # [C_out, C_in/groups, KH, KW]
    bias: jax.Array | None = None,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
    groups: int = 1,
) -> jax.Array:
    """``torch.nn.functional.conv2d`` semantics."""
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def conv_transpose2d_torch(
    x: jax.Array,  # [B, C_in, H, W]
    weight: jax.Array,  # [C_in, C_out/groups, KH, KW]  (torch deconv layout)
    bias: jax.Array | None = None,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
    groups: int = 1,
) -> jax.Array:
    """``torch.nn.functional.conv_transpose2d`` semantics.

    Implemented as a fractionally-strided *forward* convolution:
    up-dilate the input by ``stride`` (lhs_dilation), flip the kernel, and pad
    by ``dilation*(K-1) - padding`` per side.  Output size matches torch:
    ``(in-1)*stride - 2*pad + dilation*(K-1) + 1``.
    """
    c_in = x.shape[1]
    kh, kw = weight.shape[2], weight.shape[3]
    # torch layout [C_in, C_out/groups, KH, KW] -> grouped forward-conv layout
    # [C_out, C_in/groups, KH, KW] with spatially flipped taps.
    w = jnp.flip(weight, axis=(2, 3))
    # regroup: split C_in into groups, transpose in/out within each group
    cpg_in = c_in // groups
    cpg_out = weight.shape[1]
    w = w.reshape(groups, cpg_in, cpg_out, kh, kw)
    w = jnp.transpose(w, (0, 2, 1, 3, 4)).reshape(groups * cpg_out, cpg_in, kh, kw)

    pad_h = dilation[0] * (kh - 1) - padding[0]
    pad_w = dilation[1] * (kw - 1) - padding[1]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=stride,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


# ----------------------------------------------------------- norm / acts -----
def batch_norm_apply(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
    channel_axis: int = 1,
) -> jax.Array:
    """Inference-mode BatchNorm over the given channel axis (running stats) —
    ``nn.BatchNorm1d/2d(training=False)``.  XLA fuses this into the preceding
    conv."""
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    scale = (gamma / jnp.sqrt(var + eps)).reshape(shape)
    shift = (beta - mean * gamma / jnp.sqrt(var + eps)).reshape(shape)
    # keep the activation dtype (bf16 stays bf16; scale/shift are f32-derived)
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def sliding_mean_time(x: jax.Array, win: int, backend: str = "auto") -> jax.Array:
    """Centered moving average over the trailing (time) axis, same length.

    Edge positions average over the clamped valid range (a shrinking window),
    so no padding bias enters.  Shift-invariant — every sliding window sees
    the same statistic it would get from an isolated crop (up to edge
    effects), which is what lets a whole-file trunk pass stand in for
    per-window forwards (models/ecapa.py streaming mode).

    Backends (VERDICT r4 #4 — the trunk's sliding-stat chains were named as
    the HBM/VPU residual):

    * ``banded`` (default for windows that fit 3 blocks): the sliding sum
      as a 3-block band matmul — blocks of ``B`` frames contract a static
      ``[3B, B]`` 0/1 band matrix, so the whole statistic is ONE batched
      MXU matmul with no scan, no gather, and no log-pass cumsum.  f32
      operands at HIGHEST precision (the mean feeds a subtraction in
      log-mel space; bf16 rounding there measurably shifts embeddings).
    * ``cumsum``: prefix-sum difference in f32 with STATIC slices over an
      edge-padded prefix array (clamped-index semantics == edge padding) —
      one pass regardless of ``win``, VPU-bound.
    """
    t = x.shape[-1]
    h0 = win // 2
    h1 = win - 1 - h0
    # window population is static per position: a compile-time constant
    pos = np.arange(t)
    cnt = jnp.asarray((np.clip(pos + h1 + 1, 0, t)
                       - np.clip(pos - h0, 0, t)).astype(np.float32))
    if backend == "auto":
        import os

        backend = os.environ.get("SDTPU_SLIDING_BACKEND", "auto")
    if backend == "auto":
        backend = "banded" if max(h0, h1) <= 512 else "cumsum"
    if backend == "banded":
        b = max(128, -(-max(h0, h1, 1) // 128) * 128)
        n = -(-t // b)
        lead = [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x.astype(jnp.float32), lead + [(0, n * b - t)])
        xb = xp.reshape(*x.shape[:-1], n, b)
        prev = jnp.pad(xb, lead + [(1, 0), (0, 0)])[..., :n, :]
        nxt = jnp.pad(xb, lead + [(0, 1), (0, 0)])[..., 1:, :]
        x3 = jnp.concatenate([prev, xb, nxt], axis=-1)      # [..., n, 3B]
        k = np.arange(3 * b)[:, None] - b                    # input offset
        o = np.arange(b)[None, :]                            # output pos
        band = ((k >= o - h0) & (k <= o + h1)).astype(np.float32)
        s = jnp.einsum("...nk,kb->...nb", x3, jnp.asarray(band),
                       precision=jax.lax.Precision.HIGHEST)
        s = s.reshape(*x.shape[:-1], n * b)[..., :t]
        return (s / cnt).astype(x.dtype)
    cs = jnp.cumsum(x.astype(jnp.float32), axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    # clamped hi/lo indexing == edge-replicated padding of the prefix array:
    # padded[i] = cs[clip(i - h0, 0, t)], so cs[hi(pos)] = padded[pos + win]
    # and cs[lo(pos)] = padded[pos]: two STATIC slices, no gathers.
    left = jnp.zeros_like(cs[..., :1])          # cs[<0] clamps to cs[0] = 0
    right = cs[..., -1:]                        # cs[>t] clamps to cs[t]
    padded = jnp.concatenate(
        [jnp.broadcast_to(left, (*cs.shape[:-1], h0)), cs,
         jnp.broadcast_to(right, (*cs.shape[:-1], h1))], axis=-1)
    s = padded[..., win:win + t] - padded[..., :t]
    return (s / cnt).astype(x.dtype)


def prelu(x: jax.Array, alpha: jax.Array, channel_axis: int = 1) -> jax.Array:
    """``nn.PReLU`` with per-channel (or scalar) slope."""
    if alpha.ndim == 0 or alpha.shape[0] == 1:
        a = alpha.reshape(())
    else:
        shape = [1] * x.ndim
        shape[channel_axis] = x.shape[channel_axis]
        a = alpha.reshape(shape)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def layer_norm_apply(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-8
) -> jax.Array:
    """``nn.LayerNorm`` over the trailing ``gamma.ndim`` dims."""
    axes = tuple(range(x.ndim - gamma.ndim, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma + beta


# -------------------------------------------------------------------- GRU ----
class GRUParams(NamedTuple):
    """One direction of a torch ``nn.GRU`` layer.

    ``w_ih``: [3H, D] rows packed (r, z, n) like torch ``weight_ih_l0``;
    ``w_hh``: [3H, H]; biases [3H].
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b_ih: jax.Array
    b_hh: jax.Array


def gru_init(key: jax.Array, input_size: int, hidden: int, dtype=jnp.float32) -> GRUParams:
    k = 1.0 / np.sqrt(hidden)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return GRUParams(
        u(k1, (3 * hidden, input_size)),
        u(k2, (3 * hidden, hidden)),
        u(k3, (3 * hidden,)),
        u(k4, (3 * hidden,)),
    )


def gru_sequence(
    x: jax.Array,  # [B, T, D]
    params: GRUParams,
    h0: jax.Array | None = None,  # [B, H]
    reverse: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-layer unidirectional GRU with torch gate math
    (r,z reset/update, n candidate; ``h' = (1-z)*n + z*h``).

    TPU shape: the input projection for ALL timesteps is one big MXU matmul
    hoisted out of the scan; the scan body only carries the [B, H] recurrent
    matmul.  Returns (outputs [B, T, H], h_last [B, H]).
    """
    b, t, _ = x.shape
    hidden = params.w_hh.shape[1]
    if h0 is None:
        h0 = jnp.zeros((b, hidden), x.dtype)

    # precompute x @ W_ih^T + b_ih for the whole sequence: [B, T, 3H]
    xg = jnp.einsum("btd,gd->btg", x, params.w_ih) + params.b_ih
    xg_t = jnp.transpose(xg, (1, 0, 2))  # [T, B, 3H]

    w_hh_t = params.w_hh.T  # [H, 3H]
    b_hh = params.b_hh

    def step(hprev, xt):
        hg = hprev @ w_hh_t + b_hh  # [B, 3H]
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        hnew = (1.0 - z) * n + z * hprev
        return hnew, hnew

    h_last, ys = jax.lax.scan(step, h0, xg_t, reverse=reverse)
    return jnp.transpose(ys, (1, 0, 2)), h_last


def bigru_sequence(
    x: jax.Array,
    fwd: GRUParams,
    bwd: GRUParams,
    h0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Bidirectional GRU; outputs concatenated [B, T, 2H] (torch layout:
    forward features first), last states concatenated [B, 2H]."""
    y_f, h_f = gru_sequence(x, fwd, None if h0 is None else h0[..., : fwd.w_hh.shape[1]])
    y_b, h_b = gru_sequence(
        x, bwd, None if h0 is None else h0[..., fwd.w_hh.shape[1] :], reverse=True
    )
    return jnp.concatenate([y_f, y_b], axis=-1), jnp.concatenate([h_f, h_b], axis=-1)
