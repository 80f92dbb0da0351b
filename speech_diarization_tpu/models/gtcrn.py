"""GTCRN speech-enhancement net (ERB + SFE + TRA + ShuffleNet GTConv + DPGRNN).

TPU-native re-implementation of the architecture defined at
``/root/reference/gtcrn.py`` (23.67 K params, 33.0 MMACs — ``gtcrn.py:1-4``):
ERB analysis/synthesis filterbank (65 passthrough bins + 64 ERB bands,
``gtcrn.py:11-61``), subband feature extraction (``gtcrn.py:64-74``), temporal
recurrent attention (``gtcrn.py:77-93``), grouped temporal conv blocks with
causal dilated depthwise convs and channel shuffle (``gtcrn.py:107-153``),
dual-path grouped RNNs (``gtcrn.py:156-225``), 5-layer encoder/decoder with
additive skips (``gtcrn.py:228-262``), complex ratio mask (``gtcrn.py:265-274``).

Design choices for TPU:
  * functional: one flat parameter dict whose keys ARE the torch
    ``state_dict`` keys of the reference net, so the published DNS3 checkpoint
    (``gtcrn_wrap.py:157``) ports via a pure array relabel (``models/port.py``)
    and golden tests can diff activations layer by layer;
  * all convs/deconvs run as ``lax.conv_general_dilated`` on the MXU
    (deconvs as fractionally-strided convs — ``layers.conv_transpose2d_torch``);
  * the only sequential-in-T module (TRA GRUs + DPGRNN inter-RNN) scans with
    hoisted input projections; intra-RNN scans over the 33-wide frequency axis
    with B*T as the batch dimension, which keeps the MXU busy.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    GRUParams,
    batch_norm_apply,
    conv2d_torch,
    conv_transpose2d_torch,
    gru_sequence,
    layer_norm_apply,
    prelu,
)

Params = dict[str, jax.Array]


# ------------------------------------------------------------------ ERB ------
def erb_filterbank(
    low_bins: int = 65, n_erb: int = 64, nfft: int = 512,
    high_hz: float = 8000.0, fs: float = 16000.0,
) -> np.ndarray:
    """Triangular filterbank on the ERB-rate scale, [n_erb, nfft//2+1-low_bins].

    Independent construction of the fixed (non-trainable) analysis matrix the
    reference bakes into ``erb_fc`` (``gtcrn.py:30-49``): band centers equally
    spaced in ERB-rate between the low cut (bin ``low_bins``) and ``high_hz``,
    triangles between neighboring centers, half-triangles at both edges (the
    last band is the complement of its neighbor so the rows tile to 1).
    Checkpoint ports overwrite this with the stored buffer, so only the
    construction *shape* must match.
    """
    hz2erb = lambda f: 21.4 * np.log10(0.00437 * np.asarray(f) + 1.0)
    erb2hz = lambda e: (10.0 ** (np.asarray(e) / 21.4) - 1.0) / 0.00437
    low_hz = low_bins / nfft * fs
    centers = np.linspace(hz2erb(low_hz), hz2erb(high_hz), n_erb)
    bins = np.round(erb2hz(centers) / fs * nfft).astype(int)
    n_freqs = nfft // 2 + 1
    fb = np.zeros((n_erb, n_freqs), dtype=np.float32)
    eps = 1e-12
    # first band: falling edge only
    j = np.arange(bins[0], bins[1])
    fb[0, bins[0]:bins[1]] = (bins[1] - j + eps) / (bins[1] - bins[0] + eps)
    # interior bands: rising + falling triangles
    for i in range(1, n_erb - 1):
        j = np.arange(bins[i - 1], bins[i])
        fb[i, bins[i - 1]:bins[i]] = (j - bins[i - 1] + eps) / (bins[i] - bins[i - 1] + eps)
        j = np.arange(bins[i], bins[i + 1])
        fb[i, bins[i]:bins[i + 1]] = (bins[i + 1] - j + eps) / (bins[i + 1] - bins[i] + eps)
    # last band: complement of its neighbor over the final span
    fb[-1, bins[-2]:bins[-1] + 1] = 1.0 - fb[-2, bins[-2]:bins[-1] + 1]
    return np.abs(fb[:, low_bins:])


def erb_compress(p: Params, x: jax.Array, low_bins: int = 65) -> jax.Array:
    """bm: [B,C,T,257] -> [B,C,T,65+64] (``gtcrn.py:51-55``)."""
    lo = x[..., :low_bins]
    hi = x[..., low_bins:] @ p["erb.erb_fc.weight"].T
    return jnp.concatenate([lo, hi], axis=-1)


def erb_synthesize(p: Params, x: jax.Array, low_bins: int = 65) -> jax.Array:
    """bs: [B,C,T,129] -> [B,C,T,257] (``gtcrn.py:57-61``)."""
    lo = x[..., :low_bins]
    hi = x[..., low_bins:] @ p["erb.ierb_fc.weight"].T
    return jnp.concatenate([lo, hi], axis=-1)


# ------------------------------------------------------------------ SFE ------
def sfe(x: jax.Array, kernel: int = 3) -> jax.Array:
    """Subband feature extraction: neighbor-stacking along frequency,
    [B,C,T,F] -> [B,C*kernel,T,F] with torch-Unfold channel order (channel
    varies slowest; ``gtcrn.py:64-74``)."""
    half = (kernel - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (half, half)))
    f = x.shape[-1]
    shifted = [xp[..., i : i + f] for i in range(kernel)]
    stacked = jnp.stack(shifted, axis=2)  # [B, C, k, T, F]
    b, c, k, t, ff = stacked.shape
    return stacked.reshape(b, c * k, t, ff)


# ------------------------------------------------------------------ TRA ------
def _gru_params(p: Params, prefix: str, suffix: str = "") -> GRUParams:
    return GRUParams(
        p[f"{prefix}.weight_ih_l0{suffix}"],
        p[f"{prefix}.weight_hh_l0{suffix}"],
        p[f"{prefix}.bias_ih_l0{suffix}"],
        p[f"{prefix}.bias_hh_l0{suffix}"],
    )


def tra(p: Params, prefix: str, x: jax.Array) -> jax.Array:
    """Temporal recurrent attention: energy GRU gate over time
    (``gtcrn.py:77-93``)."""
    # Transpose BEFORE the frequency mean: the TPU AOT compiler folds a
    # transpose into the [B,C,T,F]->[B,C,T] reduce and then mis-assigns the
    # output layout in post-optimization ("expected f32[T,C], actual
    # f32[C,T]{1,0:T(8,128)}"), aborting the whole enhance compile.  Reducing
    # a [B,T,C,F] operand yields the [B,T,C] sequence the GRU consumes next,
    # so no transpose exists for the buggy pass to fold.
    xt = jnp.transpose(x, (0, 2, 1, 3))  # [B, T, C, F]
    # the barrier stops the simplifier from commuting the transpose back
    # through the reduce (it recreates the crashing pattern otherwise)
    xt = jax.lax.optimization_barrier(xt)
    seq = jnp.mean(xt * xt, axis=-1)  # [B, T, C]
    at, _ = gru_sequence(seq, _gru_params(p, f"{prefix}.att_gru"))
    at = at @ p[f"{prefix}.att_fc.weight"].T + p[f"{prefix}.att_fc.bias"]
    gate = jax.nn.sigmoid(jnp.transpose(at, (0, 2, 1)))  # [B, C, T]
    return x * gate[..., None]


# ------------------------------------------------------------- ConvBlock -----
def _bn(p: Params, prefix: str, x: jax.Array) -> jax.Array:
    return batch_norm_apply(
        x,
        p[f"{prefix}.running_mean"],
        p[f"{prefix}.running_var"],
        p[f"{prefix}.weight"],
        p[f"{prefix}.bias"],
    )


def conv_block(
    p: Params,
    prefix: str,
    x: jax.Array,
    stride: tuple[int, int],
    padding: tuple[int, int],
    groups: int = 1,
    deconv: bool = False,
    is_last: bool = False,
) -> jax.Array:
    """conv/deconv + BN + PReLU (Tanh when last) — ``gtcrn.py:96-104``."""
    w = p[f"{prefix}.conv.weight"]
    b = p[f"{prefix}.conv.bias"]
    if deconv:
        x = conv_transpose2d_torch(x, w, b, stride=stride, padding=padding, groups=groups)
    else:
        x = conv2d_torch(x, w, b, stride=stride, padding=padding, groups=groups)
    x = _bn(p, f"{prefix}.bn", x)
    if is_last:
        return jnp.tanh(x)
    return prelu(x, p[f"{prefix}.act.weight"])


def gt_conv_block(
    p: Params,
    prefix: str,
    x: jax.Array,
    dilation: int,
    deconv: bool = False,
) -> jax.Array:
    """Group temporal conv block with channel shuffle (``gtcrn.py:107-153``):
    half the channels go through SFE → pointwise → causal dilated depthwise →
    pointwise → TRA; then interleave-shuffle with the untouched half."""
    c = x.shape[1]
    x1, x2 = x[:, : c // 2], x[:, c // 2 :]

    # In the decoder the point convs are ConvTranspose2d (1x1, stride 1) —
    # same math as a conv but with the torch deconv weight layout.
    def point(h, name):
        w, b = p[f"{prefix}.{name}.weight"], p[f"{prefix}.{name}.bias"]
        if deconv:
            return conv_transpose2d_torch(h, w, b)
        return conv2d_torch(h, w, b)

    h = point(sfe(x1), "point_conv1")
    h = prelu(_bn(p, f"{prefix}.point_bn1", h), p[f"{prefix}.point_act.weight"])

    pad_t = 2 * dilation  # (k_t - 1) * dilation, causal front pad (gtcrn.py:145)
    h = jnp.pad(h, ((0, 0), (0, 0), (pad_t, 0), (0, 0)))
    dw = p[f"{prefix}.depth_conv.weight"]
    db = p[f"{prefix}.depth_conv.bias"]
    hidden = h.shape[1]
    if deconv:
        h = conv_transpose2d_torch(
            h, dw, db, stride=(1, 1), padding=(2 * dilation, 1),
            dilation=(dilation, 1), groups=hidden,
        )
    else:
        h = conv2d_torch(
            h, dw, db, stride=(1, 1), padding=(0, 1),
            dilation=(dilation, 1), groups=hidden,
        )
    h = prelu(_bn(p, f"{prefix}.depth_bn", h), p[f"{prefix}.depth_act.weight"])

    h = point(h, "point_conv2")
    h = _bn(p, f"{prefix}.point_bn2", h)
    h = tra(p, f"{prefix}.tra", h)

    # channel shuffle: interleave [h, x2] -> [h0, x2_0, h1, x2_1, ...]
    b, ch, t, f = h.shape
    out = jnp.stack([h, x2], axis=2).reshape(b, 2 * ch, t, f)
    return out


# ----------------------------------------------------------------- GRNN ------
def grnn(p: Params, prefix: str, x: jax.Array, bidirectional: bool) -> jax.Array:
    """Grouped RNN: two half-width GRUs on channel halves (``gtcrn.py:156-183``)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    outs = []
    for name, xi in (("rnn1", x1), ("rnn2", x2)):
        yf, _ = gru_sequence(xi, _gru_params(p, f"{prefix}.{name}"))
        if bidirectional:
            yb, _ = gru_sequence(
                xi, _gru_params(p, f"{prefix}.{name}", "_reverse"), reverse=True
            )
            yf = jnp.concatenate([yf, yb], axis=-1)
        outs.append(yf)
    return jnp.concatenate(outs, axis=-1)


def dpgrnn(p: Params, prefix: str, x: jax.Array, width: int = 33) -> jax.Array:
    """Dual-path grouped RNN (``gtcrn.py:186-225``): bidirectional intra-RNN
    over frequency (batch B*T), unidirectional inter-RNN over time (batch B*F),
    each with Linear + LayerNorm + residual."""
    b, c, t, f = x.shape
    x_btfc = jnp.transpose(x, (0, 2, 3, 1))  # [B, T, F, C]

    intra = x_btfc.reshape(b * t, f, c)
    intra = grnn(p, f"{prefix}.intra_rnn", intra, bidirectional=True)
    intra = intra @ p[f"{prefix}.intra_fc.weight"].T + p[f"{prefix}.intra_fc.bias"]
    intra = intra.reshape(b, t, f, c)
    intra = layer_norm_apply(
        intra, p[f"{prefix}.intra_ln.weight"], p[f"{prefix}.intra_ln.bias"]
    )
    intra_out = x_btfc + intra

    inter = jnp.transpose(intra_out, (0, 2, 1, 3)).reshape(b * f, t, c)
    inter = grnn(p, f"{prefix}.inter_rnn", inter, bidirectional=False)
    inter = inter @ p[f"{prefix}.inter_fc.weight"].T + p[f"{prefix}.inter_fc.bias"]
    inter = inter.reshape(b, f, t, c)
    inter = jnp.transpose(inter, (0, 2, 1, 3))  # [B, T, F, C]
    inter = layer_norm_apply(
        inter, p[f"{prefix}.inter_ln.weight"], p[f"{prefix}.inter_ln.bias"]
    )
    out = intra_out + inter
    return jnp.transpose(out, (0, 3, 1, 2))  # [B, C, T, F]


# ----------------------------------------------------------------- GTCRN -----
_ENC_GT_DILATIONS = (1, 2, 5)
_DEC_GT_DILATIONS = (5, 2, 1)


class GTCRN:
    """Functional GTCRN: spec [B, F=257, T, 2] -> enhanced spec [B, 257, T, 2]."""

    def __init__(self, low_bins: int = 65):
        self.low_bins = low_bins

    def apply(self, p: Params, spec: jax.Array) -> jax.Array:
        spec_ref = spec  # [B, F, T, 2]
        real = jnp.transpose(spec[..., 0], (0, 2, 1))  # [B, T, F]
        imag = jnp.transpose(spec[..., 1], (0, 2, 1))
        mag = jnp.sqrt(real * real + imag * imag + 1e-12)
        feat = jnp.stack([mag, real, imag], axis=1)  # [B, 3, T, 257]

        feat = erb_compress(p, feat, self.low_bins)  # [B, 3, T, 129]
        feat = sfe(feat)  # [B, 9, T, 129]

        # encoder (gtcrn.py:228-244)
        skips = []
        h = conv_block(p, "encoder.en_convs.0", feat, (1, 2), (0, 2))
        skips.append(h)
        h = conv_block(p, "encoder.en_convs.1", h, (1, 2), (0, 2), groups=2)
        skips.append(h)
        for i, d in enumerate(_ENC_GT_DILATIONS):
            h = gt_conv_block(p, f"encoder.en_convs.{2 + i}", h, d)
            skips.append(h)

        h = dpgrnn(p, "dpgrnn1", h)
        h = dpgrnn(p, "dpgrnn2", h)

        # decoder with additive skips (gtcrn.py:247-262)
        for i, d in enumerate(_DEC_GT_DILATIONS):
            h = gt_conv_block(p, f"decoder.de_convs.{i}", h + skips[4 - i], d, deconv=True)
        h = conv_block(p, "decoder.de_convs.3", h + skips[1], (1, 2), (0, 2),
                       groups=2, deconv=True)
        m_feat = conv_block(p, "decoder.de_convs.4", h + skips[0], (1, 2), (0, 2),
                            deconv=True, is_last=True)

        m = erb_synthesize(p, m_feat, self.low_bins)  # [B, 2, T, 257]

        # complex ratio mask (gtcrn.py:265-274); spec_ref as [B, 2, T, F]
        sr = jnp.transpose(spec_ref, (0, 3, 2, 1))
        out_r = sr[:, 0] * m[:, 0] - sr[:, 1] * m[:, 1]
        out_i = sr[:, 1] * m[:, 0] + sr[:, 0] * m[:, 1]
        enh = jnp.stack([out_r, out_i], axis=1)  # [B, 2, T, F]
        return jnp.transpose(enh, (0, 3, 2, 1))  # [B, F, T, 2]


# ----------------------------------------------------------------- init ------
def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def gtcrn_init_params(key: jax.Array) -> Params:
    """Random-init a parameter dict with the exact torch state_dict shapes of
    the reference net (for tests and training-from-scratch; checkpoint loads
    replace all of these via ``models/port.py``)."""
    p: Params = {}
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)

    fb = erb_filterbank()
    p["erb.erb_fc.weight"] = jnp.asarray(fb)         # [64, 192]
    p["erb.ierb_fc.weight"] = jnp.asarray(fb.T)      # [192, 64]

    def bn(prefix, c):
        p[f"{prefix}.weight"] = jnp.ones((c,))
        p[f"{prefix}.bias"] = jnp.zeros((c,))
        p[f"{prefix}.running_mean"] = jnp.zeros((c,))
        p[f"{prefix}.running_var"] = jnp.ones((c,))

    def prelu_(prefix):
        p[f"{prefix}.weight"] = jnp.full((1,), 0.25)

    def gru(prefix, d_in, hidden, bidir=False):
        bound = 1.0 / np.sqrt(hidden)
        sufs = ("", "_reverse") if bidir else ("",)
        for s in sufs:
            p[f"{prefix}.weight_ih_l0{s}"] = _uniform(nk(), (3 * hidden, d_in), bound)
            p[f"{prefix}.weight_hh_l0{s}"] = _uniform(nk(), (3 * hidden, hidden), bound)
            p[f"{prefix}.bias_ih_l0{s}"] = _uniform(nk(), (3 * hidden,), bound)
            p[f"{prefix}.bias_hh_l0{s}"] = _uniform(nk(), (3 * hidden,), bound)

    def linear(prefix, d_in, d_out):
        bound = 1.0 / np.sqrt(d_in)
        p[f"{prefix}.weight"] = _uniform(nk(), (d_out, d_in), bound)
        p[f"{prefix}.bias"] = _uniform(nk(), (d_out,), bound)

    def tra_(prefix, c):
        gru(f"{prefix}.att_gru", c, 2 * c)
        linear(f"{prefix}.att_fc", 2 * c, c)

    def conv_block_(prefix, c_in, c_out, kh, kw, groups=1, deconv=False, last=False):
        if deconv:
            # torch ConvTranspose2d weight: [C_in, C_out/groups, KH, KW]
            bound = 1.0 / np.sqrt((c_out // groups) * kh * kw)
            p[f"{prefix}.conv.weight"] = _uniform(nk(), (c_in, c_out // groups, kh, kw), bound)
        else:
            bound = 1.0 / np.sqrt((c_in // groups) * kh * kw)
            p[f"{prefix}.conv.weight"] = _uniform(nk(), (c_out, c_in // groups, kh, kw), bound)
        p[f"{prefix}.conv.bias"] = _uniform(nk(), (c_out,), bound)
        bn(f"{prefix}.bn", c_out)
        if not last:
            prelu_(f"{prefix}.act")

    def gt_conv_block_(prefix, c=16, hidden=16, deconv=False):
        half = c // 2
        if deconv:
            p[f"{prefix}.point_conv1.weight"] = _uniform(nk(), (half * 3, hidden, 1, 1), 1 / np.sqrt(hidden))
        else:
            p[f"{prefix}.point_conv1.weight"] = _uniform(nk(), (hidden, half * 3, 1, 1), 1 / np.sqrt(half * 3))
        p[f"{prefix}.point_conv1.bias"] = _uniform(nk(), (hidden,), 0.1)
        bn(f"{prefix}.point_bn1", hidden)
        prelu_(f"{prefix}.point_act")
        if deconv:
            p[f"{prefix}.depth_conv.weight"] = _uniform(nk(), (hidden, 1, 3, 3), 1 / 3.0)
        else:
            p[f"{prefix}.depth_conv.weight"] = _uniform(nk(), (hidden, 1, 3, 3), 1 / 3.0)
        p[f"{prefix}.depth_conv.bias"] = _uniform(nk(), (hidden,), 1 / 3.0)
        bn(f"{prefix}.depth_bn", hidden)
        prelu_(f"{prefix}.depth_act")
        if deconv:
            p[f"{prefix}.point_conv2.weight"] = _uniform(nk(), (hidden, half, 1, 1), 1 / np.sqrt(half))
        else:
            p[f"{prefix}.point_conv2.weight"] = _uniform(nk(), (half, hidden, 1, 1), 1 / np.sqrt(hidden))
        p[f"{prefix}.point_conv2.bias"] = _uniform(nk(), (half,), 0.1)
        bn(f"{prefix}.point_bn2", half)
        tra_(f"{prefix}.tra", half)

    def grnn_(prefix, d_in, hidden, bidir):
        gru(f"{prefix}.rnn1", d_in // 2, hidden // 2, bidir)
        gru(f"{prefix}.rnn2", d_in // 2, hidden // 2, bidir)

    def dpgrnn_(prefix, c=16, width=33):
        grnn_(f"{prefix}.intra_rnn", c, c // 2, True)  # GRNN hidden = hidden_size//2
        linear(f"{prefix}.intra_fc", c, c)
        p[f"{prefix}.intra_ln.weight"] = jnp.ones((width, c))
        p[f"{prefix}.intra_ln.bias"] = jnp.zeros((width, c))
        grnn_(f"{prefix}.inter_rnn", c, c, False)
        linear(f"{prefix}.inter_fc", c, c)
        p[f"{prefix}.inter_ln.weight"] = jnp.ones((width, c))
        p[f"{prefix}.inter_ln.bias"] = jnp.zeros((width, c))

    # encoder
    conv_block_("encoder.en_convs.0", 9, 16, 1, 5)
    conv_block_("encoder.en_convs.1", 16, 16, 1, 5, groups=2)
    for i in range(3):
        gt_conv_block_(f"encoder.en_convs.{2 + i}")
    # dual-path
    dpgrnn_("dpgrnn1")
    dpgrnn_("dpgrnn2")
    # decoder
    for i in range(3):
        gt_conv_block_(f"decoder.de_convs.{i}", deconv=True)
    conv_block_("decoder.de_convs.3", 16, 16, 1, 5, groups=2, deconv=True)
    conv_block_("decoder.de_convs.4", 16, 2, 1, 5, deconv=True, last=True)
    return p
