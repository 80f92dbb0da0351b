"""PyanNet-class chunk-local speaker-activity segmentation.

The reference's baseline pipeline rides pyannote 3.1's PyanNet segmentation:
a sliding-window net emits per-frame activities for a few LOCAL speakers per
chunk, which downstream clustering stitches into global speakers
(``diarization_baseline.py:170-181``).  This is the one algorithmic idea of
the reference stack with no analog in the flagship pipeline (VERDICT r1
missing #3) — it is what handles rapid turn-taking and overlapping speech,
which a VAD+SCD chain cannot represent (VAD is single-channel speech/nonspeech).

``SegNet``: log-mel → 2 causal convs → 2×BiGRU → linear head.  Two head
variants:

- ``powerset=False`` (legacy): sigmoid [B, T, K] multilabel activities,
  trained with permutation-invariant BCE (the pyannote 2.x recipe).
- ``powerset=True`` (default for new training): a single softmax over the
  2^K subsets of the K speaker slots — pyannote 3.x's powerset multiclass
  head (Plaquet & Bredin, Interspeech 2023), the formulation the
  reference's `pyannote/speaker-diarization-3.1` scaffold actually ships.
  Multilabel sigmoids must make K independent decisions per frame with a
  hand-tuned threshold; the powerset head makes ONE calibrated decision
  over joint configurations, which is markedly better exactly on
  overlapped frames.  ``apply`` marginalizes the class posterior back to
  per-speaker activities, so every downstream consumer (binarization,
  stitching, clustering) is unchanged.

Trained with permutation-invariant CE/BCE (slot order is arbitrary — the
PIT loss minimizes over slot permutations per chunk).

TPU notes: chunks are processed as one [n_chunks, T] batch (fixed shapes);
the BiGRU is two hoisted-input scans; everything else is MXU matmuls.
The powerset marginalization is one [C, K] constant matmul.
"""
from __future__ import annotations

import itertools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import log_mel_spectrogram
from .layers import bigru_sequence, conv1d_torch, gru_init

Params = dict[str, Any]


class SegNet:
    """Functional segmentation net: log-mel [B,T,M] -> activities [B,T,K]."""

    def __init__(self, n_mels: int = 40, channels: int = 96, hidden: int = 96,
                 n_speakers: int = 3, powerset: bool = False,
                 n_gru: int = 2, n_fc: int = 0, ds: int = 1,
                 arch: str = "gru", n_xf: int = 4, n_heads: int = 4,
                 max_frames: int = 501):
        self.n_mels = n_mels
        self.channels = channels
        self.hidden = hidden
        self.n_speakers = n_speakers
        self.powerset = powerset
        # arch="xf" (round-4, VERDICT r3 #1): replace the recurrent stack
        # with a PRE-LN TRANSFORMER encoder over the ds-rate frames.  The
        # axon compiler's pathological scan-compile behavior capped the net
        # at 2 BiGRUs (chip_queue8 v1: a 6-scan train graph sat >45 min in
        # compile); attention over the ~T/ds frames of a 5 s chunk is pure
        # MXU matmuls — no scans at all — so depth is no longer
        # compile-bound, and self-attention sees the WHOLE chunk at every
        # layer (the who-speaks-when task is global within the chunk).
        # ``max_frames`` sizes the learned positional table at the 10 ms
        # full rate (501 = 5 s chunks); longer inputs fail loudly at trace
        # time.
        self.arch = arch
        self.n_xf = n_xf
        self.n_heads = n_heads
        self.max_frames = max_frames
        # depth knobs (2026-08-19 quality push): pyannote's PyanNet runs
        # 4 BiLSTM x 128 + 2 FC x 128; the shipped 2 x BiGRU-96 net
        # plateaued at 0.86 best-perm across three training recipes —
        # capacity, not steps, is the lever.  Defaults preserve every
        # existing checkpoint's geometry (meta without these keys).
        self.n_gru = n_gru
        self.n_fc = n_fc
        # ds > 1 (round-4 architecture): a strided conv downsamples the
        # frame rate by ``ds`` BEFORE the recurrent stack, so a DEEPER
        # BiGRU stack costs fewer total scan steps than the legacy 2-GRU
        # net at 10 ms (the axon scan budget that capped depth — VERDICT r3
        # #1); the head then fuses the ds-rate context (repeat-upsampled)
        # with the full-rate conv features so activities keep 10 ms
        # boundary resolution.  pyannote's PyanNet does the same thing with
        # SincNet striding (its LSTM stack runs at ~17 ms frames).
        self.ds = ds

    @property
    def n_out(self) -> int:
        return 2 ** self.n_speakers if self.powerset else self.n_speakers

    def membership(self) -> np.ndarray:
        """[2^K, K] binary matrix: class c contains speaker k iff bit k of c
        is set (class 0 = silence)."""
        k = self.n_speakers
        return ((np.arange(2 ** k)[:, None] >> np.arange(k)[None, :]) & 1
                ).astype(np.float32)

    def init(self, key: jax.Array) -> Params:
        k = jax.random.split(key, 6 + 2 * self.n_gru + self.n_fc)
        c, h, m = self.channels, self.hidden, self.n_mels
        he = jax.nn.initializers.he_normal()
        params: Params = {
            "conv1_w": he(k[0], (c, m, 5)),
            "conv1_b": jnp.zeros((c,)),
            "conv2_w": he(k[1], (c, c, 3)),
            "conv2_b": jnp.zeros((c,)),
            "out_w": he(k[2], (2 * h, self.n_out)),
            "out_b": jnp.zeros((self.n_out,)),
        }
        if self.arch == "xf":
            dm = 2 * h
            params["ds_w"] = he(k[3], (dm, c, 2 * self.ds))
            params["ds_b"] = jnp.zeros((dm,))
            params["fuse_w"] = he(k[4], (dm + c, 2 * h))
            params["fuse_b"] = jnp.zeros((2 * h,))
            t_ds = self.max_frames // self.ds + 2
            params["pos_emb"] = 0.02 * jax.random.normal(
                jax.random.fold_in(key, 78), (t_ds, dm))
            kx = jax.random.split(jax.random.fold_in(key, 77),
                                  4 * self.n_xf)
            for i in range(self.n_xf):
                q = kx[4 * i:4 * i + 4]
                p = f"xf{i + 1}_"
                params[p + "ln1_g"] = jnp.ones((dm,))
                params[p + "ln1_b"] = jnp.zeros((dm,))
                params[p + "qkv_w"] = he(q[0], (dm, 3 * dm))
                params[p + "qkv_b"] = jnp.zeros((3 * dm,))
                params[p + "proj_w"] = he(q[1], (dm, dm))
                params[p + "proj_b"] = jnp.zeros((dm,))
                params[p + "ln2_g"] = jnp.ones((dm,))
                params[p + "ln2_b"] = jnp.zeros((dm,))
                params[p + "ff1_w"] = he(q[2], (dm, 4 * dm))
                params[p + "ff1_b"] = jnp.zeros((4 * dm,))
                params[p + "ff2_w"] = he(q[3], (4 * dm, dm))
                params[p + "ff2_b"] = jnp.zeros((dm,))
            params["xf_lnf_g"] = jnp.ones((dm,))
            params["xf_lnf_b"] = jnp.zeros((dm,))
            for i in range(self.n_fc):
                params[f"fc{i + 1}_w"] = he(
                    k[5 + 2 * self.n_gru + i], (2 * h, 2 * h))
                params[f"fc{i + 1}_b"] = jnp.zeros((2 * h,))
            return params
        if self.ds > 1:
            params["ds_w"] = he(k[3], (c, c, 2 * self.ds))
            params["ds_b"] = jnp.zeros((c,))
            params["fuse_w"] = he(k[4], (2 * h + c, 2 * h))
            params["fuse_b"] = jnp.zeros((2 * h,))
        for i in range(self.n_gru):
            d_in = c if i == 0 else 2 * h
            params[f"gru{i + 1}_f"] = gru_init(k[5 + 2 * i], d_in, h)
            params[f"gru{i + 1}_b"] = gru_init(k[6 + 2 * i], d_in, h)
        for i in range(self.n_fc):
            params[f"fc{i + 1}_w"] = he(k[5 + 2 * self.n_gru + i],
                                        (2 * h, 2 * h))
            params[f"fc{i + 1}_b"] = jnp.zeros((2 * h,))
        return params

    @staticmethod
    def _ln(x: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
        mu = jnp.mean(x, -1, keepdims=True)
        v = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(v + 1e-5) * g + b

    def _xf_block(self, params: Params, i: int, x: jax.Array) -> jax.Array:
        """Pre-LN transformer encoder block on [B, T_ds, D]."""
        p = f"xf{i + 1}_"
        dm = x.shape[-1]
        nh = self.n_heads
        hd = dm // nh
        h1 = self._ln(x, params[p + "ln1_g"], params[p + "ln1_b"])
        qkv = h1 @ params[p + "qkv_w"] + params[p + "qkv_b"]
        q, kk, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # [B, T, D] -> [B, nh, T, hd]
            return jnp.transpose(
                z.reshape(z.shape[0], z.shape[1], nh, hd), (0, 2, 1, 3))

        q, kk, v = heads(q), heads(kk), heads(v)
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, kk) / jnp.sqrt(float(hd)), -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(x.shape)
        x = x + o @ params[p + "proj_w"] + params[p + "proj_b"]
        h2 = self._ln(x, params[p + "ln2_g"], params[p + "ln2_b"])
        f = jax.nn.gelu(h2 @ params[p + "ff1_w"] + params[p + "ff1_b"])
        return x + f @ params[p + "ff2_w"] + params[p + "ff2_b"]

    def logits(self, params: Params, feats: jax.Array) -> jax.Array:
        """[B, T, M] log-mel -> [B, T, n_out] raw head logits."""
        x = jnp.transpose(feats, (0, 2, 1))  # [B, M, T]
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
        x = jax.nn.silu(conv1d_torch(x, params["conv1_w"], params["conv1_b"]))
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
        x = jax.nn.silu(
            conv1d_torch(x, params["conv2_w"], params["conv2_b"], dilation=2))
        xt = jnp.transpose(x, (0, 2, 1))  # [B, T, C] full-rate features
        if self.arch == "xf":
            d = self.ds
            xd = jnp.pad(x, ((0, 0), (0, 0), (d, d)))
            xd = conv1d_torch(xd, params["ds_w"], params["ds_b"], stride=d)
            g = jax.nn.silu(jnp.transpose(xd, (0, 2, 1)))  # [B, T_ds, D]
            g = g + params["pos_emb"][: g.shape[1]]
            for i in range(self.n_xf):
                g = self._xf_block(params, i, g)
            g = self._ln(g, params["xf_lnf_g"], params["xf_lnf_b"])
            up = jnp.repeat(g, d, axis=1)[:, : xt.shape[1]]
            x = jax.nn.silu(
                jnp.concatenate([up, xt], axis=-1) @ params["fuse_w"]
                + params["fuse_b"])
        elif self.ds > 1:
            d = self.ds
            xd = jnp.pad(x, ((0, 0), (0, 0), (d, d)))
            xd = jax.nn.silu(
                conv1d_torch(xd, params["ds_w"], params["ds_b"], stride=d))
            g = jnp.transpose(xd, (0, 2, 1))  # [B, ~T/d, C]
            for i in range(self.n_gru):
                g, _ = bigru_sequence(g, params[f"gru{i + 1}_f"],
                                      params[f"gru{i + 1}_b"])
            # repeat-upsample the ds-rate context back to the 10 ms grid and
            # fuse with the full-rate conv features, so boundary resolution
            # stays 10 ms while the recurrent depth runs at T/ds scan steps
            up = jnp.repeat(g, d, axis=1)[:, : xt.shape[1]]
            x = jax.nn.silu(
                jnp.concatenate([up, xt], axis=-1) @ params["fuse_w"]
                + params["fuse_b"])
        else:
            x = xt
            for i in range(self.n_gru):
                x, _ = bigru_sequence(x, params[f"gru{i + 1}_f"],
                                      params[f"gru{i + 1}_b"])
        for i in range(self.n_fc):
            x = jax.nn.silu(x @ params[f"fc{i + 1}_w"]
                            + params[f"fc{i + 1}_b"])
        return x @ params["out_w"] + params["out_b"]

    def apply(self, params: Params, feats: jax.Array) -> jax.Array:
        """-> [B, T, K] per-speaker activities in [0, 1] (both heads)."""
        logits = self.logits(params, feats)
        if not self.powerset:
            return jax.nn.sigmoid(logits)
        # marginalize the class posterior: P(speaker k) = sum of P(class c)
        # over classes containing k — one [C, K] constant matmul
        probs = jax.nn.softmax(logits, axis=-1)
        return probs @ jnp.asarray(self.membership())

    def apply_hard(self, params: Params, feats: jax.Array) -> jax.Array:
        """-> [B, T, K] BINARY activities via the head's native decision.

        Powerset: argmax over the 2^K classes — ONE calibrated joint
        decision per frame, the pyannote-3.x decode.  Thresholding the
        marginalized activities at 0.5 instead loses exactly the frames
        where the posterior spreads over neighboring subsets: measured on
        the xf checkpoint (2026-08-20), marginal-threshold best-perm reads
        0.856 in-domain while argmax decode reads 0.912 — a third of the
        apparent frame error was DECODE loss, not model loss (misses sat
        at max-marginal ~0.43).  Sigmoid head: plain 0.5 threshold."""
        logits = self.logits(params, feats)
        if not self.powerset:
            return (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
        memb = jnp.asarray(self.membership())
        return memb[jnp.argmax(logits, axis=-1)]


class SegmentationModel:
    """Waveform wrapper: [B, T_samples] -> [B, n_frames, K] local activities
    at ``hop_ms`` (PyanNet analog of ``pyannote/segmentation-3.0``)."""

    def __init__(self, net: SegNet | None = None, sample_rate: int = 16000,
                 hop_ms: float = 10.0, win_ms: float = 25.0):
        self.net = net or SegNet()
        self.sample_rate = sample_rate
        self.hop_ms = hop_ms
        self.win_ms = win_ms

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def _feats(self, y: jax.Array) -> jax.Array:
        feats = log_mel_spectrogram(
            y, sample_rate=self.sample_rate, n_mels=self.net.n_mels,
            win_ms=self.win_ms, hop_ms=self.hop_ms,
        )
        return (feats + 6.0) * 0.25  # fixed affine rescale (see models/vad.py)

    def activities(self, params: Params, y: jax.Array) -> jax.Array:
        squeeze = y.ndim == 1
        if squeeze:
            y = y[None]
        a = self.net.apply(params, self._feats(y))
        return a[0] if squeeze else a

    def head_logits(self, params: Params, y: jax.Array) -> jax.Array:
        """[B, T_samples] -> [B, n_frames, n_out] raw head logits (training
        objective input; ``powerset_pit_ce_loss`` needs logits, not the
        marginalized activities)."""
        return self.net.logits(params, self._feats(y))

    def hard_activities(self, params: Params, y: jax.Array) -> jax.Array:
        """[B, T_samples] -> [B, n_frames, K] binary activities via the
        head's native decision (see :meth:`SegNet.apply_hard`)."""
        squeeze = y.ndim == 1
        if squeeze:
            y = y[None]
        a = self.net.apply_hard(params, self._feats(y))
        return a[0] if squeeze else a


def pit_bce_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Permutation-invariant BCE over the K speaker slots.

    pred/target [B, T, K]; the loss for each chunk is the minimum BCE over
    all K! slot permutations (K <= 4 keeps the enumeration trivial)."""
    k = pred.shape[-1]
    losses = []
    for perm in itertools.permutations(range(k)):
        p = pred[..., list(perm)]
        bce = -(target * jnp.log(p + eps) + (1 - target) * jnp.log(1 - p + eps))
        losses.append(jnp.mean(bce, axis=(1, 2)))  # [B]
    return jnp.mean(jnp.min(jnp.stack(losses), axis=0))


def powerset_pit_ce_loss(
    logits: jax.Array,
    target: jax.Array,
    overlap_weight: float = 0.0,
) -> jax.Array:
    """Permutation-invariant cross-entropy over the speaker-subset powerset
    (pyannote 3.x training objective, Plaquet & Bredin 2023).

    logits [B, T, 2^K], target [B, T, K] binary activities.  For each of the
    K! slot permutations the target frame's class index is its permuted
    activity pattern read as a binary number; the chunk loss is the minimum
    mean CE over permutations (K <= 4 keeps the enumeration trivial).

    ``overlap_weight`` > 0 up-weights frames with >= 2 active speakers by
    ``(1 + overlap_weight)`` — overlap frames are ~20% of the data but carry
    most of the residual error (frame acc 0.70 on overlap vs 0.96 overall,
    2026-08-18), so the plain mean under-trains exactly the capability that
    distinguishes this engine from the VAD+SCD flagship."""
    k = target.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)  # [B, T, C]
    weights = 2 ** jnp.arange(k)  # bit k of the class index
    tgt = (target > 0.5).astype(jnp.int32)
    fw = 1.0 + overlap_weight * (jnp.sum(tgt, axis=-1) >= 2)  # [B, T]
    fw = fw / jnp.mean(fw, axis=1, keepdims=True)  # keep per-chunk scale
    losses = []
    for perm in itertools.permutations(range(k)):
        cls = jnp.sum(tgt[..., list(perm)] * weights, axis=-1)  # [B, T]
        ce = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
        losses.append(jnp.mean(fw * ce, axis=1))  # [B]
    return jnp.mean(jnp.min(jnp.stack(losses), axis=0))


def best_permutation_accuracy(pred: np.ndarray, target: np.ndarray) -> float:
    """Frame accuracy after the best slot permutation PER CHUNK (probe
    metric).  Slot identity is only meaningful within one chunk — the PIT
    loss lets every chunk pick its own assignment and the downstream
    stitcher re-aligns chunks pairwise — so the permutation is chosen per
    example, matching pyannote's local-PIT evaluation semantics.  (A single
    batch-global permutation, the pre-2026-08-18 behavior, punished chunks
    whose arbitrary slot order disagreed with the majority: 0.856 global
    vs 0.908 per-chunk on the same checkpoint.)"""
    k = pred.shape[-1]
    if pred.ndim == 2:
        pred, target = pred[None], target[None]
    p = pred > 0.5
    t = target > 0.5
    accs = np.stack([
        (p[..., list(perm)] == t).mean(axis=(1, 2))
        for perm in itertools.permutations(range(k))
    ])  # [K!, B]
    return float(accs.max(axis=0).mean())
