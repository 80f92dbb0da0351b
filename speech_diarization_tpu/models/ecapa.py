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
from .layers import batch_norm_apply, conv1d_torch, sliding_mean_time

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
                      train: bool = False, se_win: int | None = None) -> jax.Array:
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
        # squeeze-excitation: global mean per utterance, or — in streaming
        # mode — a sliding mean so each frame's gate matches what an isolated
        # se_win-frame crop around it would compute (the SE conv1x1s are
        # pointwise, so feeding [B, C, T] means instead of [B, C, 1] yields a
        # per-frame gate at negligible extra cost)
        dt = y.dtype
        if se_win is None:
            zm = jnp.mean(y, axis=2, keepdims=True)  # [B, C, 1]
        else:
            zm = sliding_mean_time(y, se_win)  # [B, C, T]
        z = jax.nn.relu(conv1d_torch(zm, p["se_w1"].astype(dt), p["se_b1"].astype(dt)))
        z = jax.nn.sigmoid(conv1d_torch(z, p["se_w2"].astype(dt), p["se_b2"].astype(dt)))
        return residual + y * z

    def trunk(self, params: Params, feats: jax.Array, train: bool = False,
              se_win: int | None = None) -> jax.Array:
        """Convolutional trunk: feats [B, T, n_mels] -> [B, 3C, T] post-MFA
        features.  Shift-invariant when ``se_win`` is set (streaming mode), so
        one whole-file pass can serve every sliding window (pool_grid)."""
        x = jnp.transpose(feats, (0, 2, 1)).astype(self.dtype)  # [B, M, T]
        x = _conv_bn_apply(params["stem"], x, padding=2, train=train)
        block_outs = []
        for i, d in enumerate(self.dilations):
            x = self._se_res2block(params[f"block{i}"], x, d, train=train,
                                   se_win=se_win)
            block_outs.append(x)
        x = jnp.concatenate(block_outs, axis=1)  # [B, 3C, T]
        return _conv_bn_apply(params["mfa"], x, train=train)

    def apply(self, params: Params, feats: jax.Array, train: bool = False) -> jax.Array:
        """feats [B, T, n_mels] -> [B, emb_dim] (f32)."""
        x = self.trunk(params, feats, train=train)
        return self.asp_head(params, x, train=train)

    def asp_head(self, params: Params, x: jax.Array, train: bool = False) -> jax.Array:
        """Attentive-stats pooling + FC: trunk features [B, 3C, T] ->
        embeddings [B, emb_dim] (f32)."""
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
        return self._stats_to_emb(params, stats, train)

    def _stats_to_emb(self, params: Params, stats: jax.Array,
                      train: bool = False) -> jax.Array:
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

    def asp_head_grid(
        self,
        params: Params,
        x: jax.Array,      # [CC, T_f] whole-chunk trunk features
        first_f: int,      # frame offset of window 0
        hop_f: int,        # window hop in frames
        win_f: int,        # window length in frames
        n_windows: int,
        train: bool = False,
    ) -> jax.Array:
        """Sliding-grid ASP, algebraically equal to ``asp_head`` over the
        framed windows but restructured for HBM (BENCH r2 roofline: the grid
        embed chunk measured 5% MFU at hbm_frac 1.07 — memory-bound):

        * the global-context window statistics (mu, sd) come from two prefix
          sums over ``T_f`` frames instead of reductions over the gathered
          ``[W, CC, win_f]`` tensor (win/hop = 10x redundant reads);
        * the attention pre-projection is a 1x1 conv over the *concat*
          ``[x, mu, sd]`` — it distributes, so its ``x`` term is ONE shared
          ``[A, T_f]`` matmul and the stats enter as a per-window additive
          bias; the ``[W, 3CC, win_f]`` ctx tensor (the single largest HBM
          object of the old path) is never materialized.

        Equivalence is pinned by tests/test_streaming_ecapa.py.
        """
        eps = 1e-12
        cc = x.shape[0]
        dt = self.dtype
        x32 = x.astype(jnp.float32)
        starts = first_f + hop_f * np.arange(n_windows)

        # per-window mean/std from prefix sums: O(T_f), not O(W * win_f)
        cs1 = jnp.pad(jnp.cumsum(x32, axis=-1), ((0, 0), (1, 0)))
        cs2 = jnp.pad(jnp.cumsum(x32 * x32, axis=-1), ((0, 0), (1, 0)))
        s1 = cs1[:, starts + win_f] - cs1[:, starts]   # [CC, W]
        s2 = cs2[:, starts + win_f] - cs2[:, starts]
        mu_g = s1.T / win_f                            # [W, CC]
        sd_g = jnp.sqrt(jnp.clip(s2.T / win_f - mu_g * mu_g, eps))

        # attention conv, decomposed over the ctx concat
        w1 = params["att_w1"][..., 0]                  # [A, 3CC]
        w1x, w1m, w1s = w1[:, :cc], w1[:, cc:2 * cc], w1[:, 2 * cc:]
        hx = jnp.einsum("ac,ct->at", w1x.astype(dt), x.astype(dt))  # [A, T_f]
        bw = (mu_g.astype(dt) @ w1m.astype(dt).T
              + sd_g.astype(dt) @ w1s.astype(dt).T
              + params["att_b1"].astype(dt))           # [W, A]

        idx = starts[:, None] + np.arange(win_f)[None, :]   # [W, win_f]
        hxw = jnp.transpose(hx[:, idx], (1, 0, 2))          # [W, A, win_f]
        a = jax.nn.relu(hxw + bw[:, :, None])
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
        e = jnp.einsum("ca,wat->wct", params["att_w2"][..., 0].astype(dt), a,
                       preferred_element_type=jnp.float32)
        e = e + params["att_b2"].astype(jnp.float32)[None, :, None]
        a = jax.nn.softmax(e, axis=2)                  # [W, CC, win_f] f32

        xw = x[:, idx].transpose(1, 0, 2)              # [W, CC, win_f] (dt)
        mu = jnp.einsum("wct,wct->wc", a, xw.astype(jnp.float32))
        m2 = jnp.einsum("wct,wct->wc", a, jnp.square(xw.astype(jnp.float32)))
        sd = jnp.sqrt(jnp.clip(m2 - mu * mu, eps))
        stats = jnp.concatenate([mu, sd], axis=1)      # [W, 2CC]
        return self._stats_to_emb(params, stats, train)

    def asp_head_grid_pallas(
        self,
        params: Params,
        x: jax.Array,      # [CC, T_f] whole-chunk trunk features
        first_f: int,
        hop_f: int,
        win_f: int,
        n_windows: int,
        interpret: bool = False,
    ) -> jax.Array:
        """Fused-kernel variant of :meth:`asp_head_grid`: the per-window
        attention chain (pre-projection, BN, tanh, logits, softmax, weighted
        stats) runs entirely in VMEM (ops/pallas/asp_grid.py), so the
        ``[W, CC, win_f]`` logits/weights tensors — the decomposed path's
        remaining HBM objects, ~GBs of traffic per chunk — are never
        materialized.  Same math; inference BN folded to scale/shift."""
        from ..ops.pallas.asp_grid import asp_grid_stats

        eps = 1e-12
        cc = x.shape[0]
        x32 = x.astype(jnp.float32)
        starts = first_f + hop_f * np.arange(n_windows)

        # per-window global-context stats from prefix sums (as asp_head_grid)
        cs1 = jnp.pad(jnp.cumsum(x32, axis=-1), ((0, 0), (1, 0)))
        cs2 = jnp.pad(jnp.cumsum(x32 * x32, axis=-1), ((0, 0), (1, 0)))
        s1 = cs1[:, starts + win_f] - cs1[:, starts]
        s2 = cs2[:, starts + win_f] - cs2[:, starts]
        mu_g = s1.T / win_f                            # [W, CC]
        sd_g = jnp.sqrt(jnp.clip(s2.T / win_f - mu_g * mu_g, eps))

        w1 = params["att_w1"][..., 0]                  # [A, 3CC]
        w1x, w1m, w1s = w1[:, :cc], w1[:, cc:2 * cc], w1[:, 2 * cc:]
        bw = (mu_g @ w1m.astype(jnp.float32).T
              + sd_g @ w1s.astype(jnp.float32).T
              + params["att_b1"].astype(jnp.float32))  # [W, A]

        ab = params["att_bn"]
        inv = jax.lax.rsqrt(ab["var"].astype(jnp.float32) + 1e-5)
        s_bn = ab["gamma"].astype(jnp.float32) * inv
        t_bn = ab["beta"].astype(jnp.float32) - ab["mean"].astype(jnp.float32) * s_bn

        stats = asp_grid_stats(
            x, bw, w1x, s_bn, t_bn, params["att_w2"][..., 0],
            params["att_b2"], first_f, hop_f, win_f, n_windows,
            interpret=interpret,
        )
        return self._stats_to_emb(params, stats)


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

    # ------------------------------------------------------- streaming -------
    def encode_grid_chunk(
        self,
        params: Params,
        y: jax.Array,  # [T_chunk] waveform slice incl. margins
        n_windows: int,
        margin: int,  # samples of context on each side (multiple of hop)
        win: int,  # window length in samples
        hop: int,  # grid hop in samples
        backend: str | None = None,  # None = SDTPU_ASP_BACKEND / auto
    ) -> jax.Array:
        """Streaming sliding-window embeddings: ONE trunk pass over the whole
        chunk, then per-window attentive-stats pooling — [n_windows, emb_dim].

        The dense grid windows overlap win/hop-fold (10x at the default
        1 s / 100 ms grid), so the per-window forward of ``encode_batch``
        recomputes every trunk FLOP 10x.  Here the trunk runs once with
        *sliding* statistics (sliding SE means, sliding fbank mean-norm) so
        its features are shift-invariant, and only the cheap ASP head runs
        per window.  Window ``i`` pools trunk frames starting at
        ``(margin + i*hop) / mel_hop``.

        Semantics differ from ``encode_batch`` in three harmless ways: no
        per-window reflect pad at window edges (windows see REAL left/right
        context — strictly more information), SE/mean-norm statistics are
        centered per frame instead of per window, and the fbank mean is a
        sliding window rather than an utterance mean.  Quality is gated by
        the DER harness, equivalence by tests/test_streaming_ecapa.py.
        """
        mel_hop = int(self.sample_rate * 10 // 1000)
        assert margin % hop == 0 and hop % mel_hop == 0 and win % mel_hop == 0
        win_f = win // mel_hop + 1  # frames per window (center=True: +1)
        hop_f = hop // mel_hop
        from ..dsp.mel import log_mel_spectrogram

        feats = log_mel_spectrogram(
            y[None], sample_rate=self.sample_rate, n_mels=self.net.n_mels
        )  # [1, T_f, M]
        feats = feats - jnp.swapaxes(
            sliding_mean_time(jnp.swapaxes(feats, 1, 2), win_f), 1, 2)
        x = self.net.trunk(params, feats, se_win=win_f)[0]  # [CC, T_f]

        first = margin // mel_hop
        need_f = first + (n_windows - 1) * hop_f + win_f
        if x.shape[-1] < need_f:
            x = jnp.pad(x, ((0, 0), (0, need_f - x.shape[-1])))
        # ASP head backend: 'pallas' fuses the per-window attention chain in
        # VMEM (ops/pallas/asp_grid.py); 'decomposed' is the jnp fallback
        # (no [W, 3CC, win_f] ctx materialization but still ~GBs of logits
        # traffic — BENCH r2/r3 rooflines).  Default: pallas on device,
        # decomposed on CPU (pallas has no compiled CPU lowering).
        import os

        if backend is None:
            backend = os.environ.get("SDTPU_ASP_BACKEND", "auto")
        if backend == "auto":
            import jax as _jax

            backend = ("decomposed" if _jax.default_backend() == "cpu"
                       else "pallas")
        if backend == "pallas":
            return self.net.asp_head_grid_pallas(
                params, x, first, hop_f, win_f, n_windows)
        return self.net.asp_head_grid(params, x, first, hop_f, win_f, n_windows)
