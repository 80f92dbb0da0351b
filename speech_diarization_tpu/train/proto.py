"""Prototypical (GE2E-style) speaker-encoder training over unlimited
synthetic speakers.

Why this exists: AAM-softmax over a FIXED speaker bank memorizes the bank —
round-2 measurement: 64-speaker multi-condition AAM training reached probe
purity 1.00 on the bank but EER 0.46 (chance) on UNSEEN source-filter
speakers (``scripts/probe_encoder.py``).  Synthetic data has an unlimited
supply of speakers, which classifier losses cannot exploit; the angular-
prototypical loss needs no classifier, so every few hundred steps the whole
speaker pool is thrown away and regenerated with fresh profiles — over a run
the encoder sees thousands of distinct speakers and the ONLY strategy that
minimizes the loss is estimating the physical profile (F0, vocal-tract
scale) from the audio, i.e. actual speaker discrimination.

Batch layout: N speakers × M utterances, embedded through the streaming
trunk-shared grid (the production inference regime — per-window-trained
weights measurably lose DER through the streaming grid, recipes.py).
Utterance embedding = normalized mean of its window embeddings; loss is
angular prototypical with leave-one-out centroids for the own-speaker
column (Chung et al., "In defence of metric learning for speaker
recognition") — learnable scale/bias, CE over speakers.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def angular_proto_loss(
    emb: jax.Array,  # [N, M, D] (unnormalized ok)
    scale: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """Angular prototypical loss with leave-one-out self-centroids."""
    n, m, _ = emb.shape
    e = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)
    cent = e.mean(axis=1)  # [N, D] full centroids (for other-speaker cols)
    cent_full = cent / (jnp.linalg.norm(cent, axis=-1, keepdims=True) + 1e-9)
    # leave-one-out centroid for the query's own speaker
    loo = (cent[:, None, :] * m - e) / (m - 1)  # [N, M, D]
    loo = loo / (jnp.linalg.norm(loo, axis=-1, keepdims=True) + 1e-9)

    cos_other = jnp.einsum("nmd,kd->nmk", e, cent_full)  # [N, M, N]
    cos_self = jnp.einsum("nmd,nmd->nm", e, loo)  # [N, M]
    eye = jnp.eye(n, dtype=bool)[:, None, :]  # [N, 1, N]
    cos = jnp.where(eye, cos_self[..., None], cos_other)
    logits = jnp.clip(scale, 1e-3) * cos + bias
    labels = jnp.broadcast_to(jnp.arange(n)[:, None], (n, m))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1).mean()


def train_speaker_encoder_proto(
    steps: int = 2000,
    spk_per_batch: int = 12,
    utt_per_spk: int = 4,
    lr: float = 3e-4,
    seed: int = 0,
    net=None,
    out_path: str | Path | None = None,
    init_params: dict | None = None,
    pool_speakers: int = 160,
    pool_utts: int = 4,
    pool_refresh_steps: int = 250,
    dur_s: float = 3.0,
    win_s: float = 1.0,
    hop_s: float = 0.5,
    channel_p: float = 0.5,
    family: str = "mixed",
    log_every: int = 50,
    channel_kwargs: dict | None = None,
    competing_p: float = 0.0,
    competing_snr_db: tuple[float, float] = (5.0, 20.0),
    hard_pair_frac: float = 0.0,
) -> tuple[dict, dict]:
    """Fine-tune (or train) the streaming-regime ECAPA with the angular
    prototypical objective over a periodically regenerated speaker pool.

    Pool economics on a 1-core host: one pool = ``pool_speakers*pool_utts``
    rendered utterances (~30 s at the defaults), amortized over
    ``pool_refresh_steps`` steps; per-step cost is augmentation only
    (gain/pre-emphasis plus an FFT-convolved RIR at probability
    ``channel_p``).
    """
    import optax

    from ..models.ecapa import EcapaModel, EcapaTdnn
    from .multicond import ChannelBank, render_speaker
    from .recipes import _flatten

    net = net or EcapaTdnn(n_mels=40, channels=128, emb_dim=64, scale=4,
                           se_channels=32, att_channels=32)
    model = EcapaModel(net)
    sr = model.sample_rate
    n = int(dur_s * sr)
    win, hop = int(win_s * sr), int(hop_s * sr)
    n_win = (n - win) // hop + 1

    key = jax.random.PRNGKey(seed)
    params = init_params if init_params is not None else model.init(key)
    params.pop("classifier", None)
    params.setdefault("proto_scale", jnp.asarray(10.0))
    params.setdefault("proto_bias", jnp.asarray(-5.0))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)
    channels = ChannelBank(rng)

    # hard-pair mining (round 4, VERDICT r3 #2): the 60 s in-domain tail is
    # near-collided speaker pairs (window cross-cos 0.81/0.93) whose
    # bisection statistic cannot separate them — oracle window accuracy is
    # 1.000, so the pairs ARE separable and the gap is the encoder's
    # CLUSTERING MARGIN.  Grid-spread random pools almost never contain
    # such pairs, so the loss never trains that margin.  With
    # ``hard_pair_frac`` > 0, that fraction of pool speakers is generated
    # as ADJACENT near-collided pairs (f0 within ~3%, same tract scale,
    # formants within ~3%) and every batch force-includes some pairs —
    # the angular-proto CE then pushes those exact negatives apart.
    n_hard_pairs = int(pool_speakers * hard_pair_frac / 2)
    hard_lo = pool_speakers - 2 * n_hard_pairs

    def render_pool():
        from .multicond import make_mc_speaker_bank

        # full-identity profiles (f0 + tract scale + formant pattern) — the
        # same identity manifold the in-domain conversations draw from
        profs = make_mc_speaker_bank(rng, pool_speakers)
        for j in range(n_hard_pairs):
            a = profs[hard_lo + 2 * j]
            profs[hard_lo + 2 * j + 1] = {
                "f0": a["f0"] * float(rng.uniform(0.97, 1.03)),
                "shift": a["shift"],
                "formants": np.asarray(a["formants"])
                * rng.uniform(0.97, 1.03, 3),
            }
        pool = np.zeros((pool_speakers, pool_utts, n), np.float32)
        for s, prof in enumerate(profs):
            for u in range(pool_utts):
                fam = (family if family != "mixed"
                       else ("lpc" if rng.uniform() < 0.5 else "harm"))
                w = render_speaker(rng, prof, dur_s, sr, family=fam)
                pool[s, u, : min(n, len(w))] = w[:n]
        return pool

    def draw_batch(pool):
        if n_hard_pairs and spk_per_batch >= 4:
            k = min(spk_per_batch // 4, n_hard_pairs)
            pids = rng.choice(n_hard_pairs, k, replace=False)
            hard = np.concatenate(
                [[hard_lo + 2 * p, hard_lo + 2 * p + 1] for p in pids])
            rest = rng.choice(hard_lo, spk_per_batch - len(hard),
                              replace=False)
            spk = np.concatenate([hard, rest])
        else:
            spk = rng.choice(pool.shape[0], spk_per_batch, replace=False)
        out = np.empty((spk_per_batch, utt_per_spk, n), np.float32)
        for i, s in enumerate(spk):
            us = rng.choice(pool.shape[1], utt_per_spk,
                            replace=pool.shape[1] < utt_per_spk)
            for j, u in enumerate(us):
                w = pool[s, u]
                if competing_p and rng.uniform() < competing_p:
                    # competing-speaker augmentation: a DIFFERENT pool
                    # speaker mixed under the foreground — the encoder must
                    # embed the dominant voice, the babble-eval failure mode
                    # (63% confusion at 15 dB when trained without this)
                    o = int(rng.integers(0, pool.shape[0] - 1))
                    o = o + (o >= s)
                    bg = pool[o, int(rng.integers(0, pool.shape[1]))]
                    snr = float(rng.uniform(*competing_snr_db))
                    sp = float(np.mean(w.astype(np.float64) ** 2) + 1e-12)
                    bp = float(np.mean(bg.astype(np.float64) ** 2) + 1e-12)
                    g = np.sqrt(sp / (bp * 10.0 ** (snr / 10.0)))
                    w = w + (g * bg).astype(np.float32)
                if rng.uniform() < channel_p:
                    w = channels.apply(rng, w, **(channel_kwargs or {}))[:n]
                    w = np.pad(w, (0, n - len(w)))
                if rng.uniform() < 0.5:  # pre-emphasis jitter
                    w = np.concatenate([w[:1], w[1:] - 0.97 * w[:-1]])
                gain = 10.0 ** (rng.uniform(-12.0, 6.0) / 20.0)
                out[i, j] = np.clip(w * gain, -0.99, 0.99)
        return out

    def encode(p, wavs):  # [B, T] -> [B, D] utterance embeddings
        # decomposed ASP backend: pallas_call has no JVP rule, so training
        # must differentiate through the jnp path (chipq10 failure, r4)
        embs = jax.vmap(
            lambda y: model.encode_grid_chunk(
                p, y, n_win, 0, win, hop, backend="decomposed")
        )(wavs)
        e = embs / (jnp.linalg.norm(embs, axis=-1, keepdims=True) + 1e-9)
        return e.mean(axis=1)

    def loss_fn(p, wavs):  # wavs [N, M, T]
        flat = wavs.reshape(-1, wavs.shape[-1])
        emb = encode(p, flat).reshape(
            spk_per_batch, utt_per_spk, -1)
        return angular_proto_loss(emb, p["proto_scale"], p["proto_bias"])

    @jax.jit
    def step(p, o, wavs):
        loss, grads = jax.value_and_grad(loss_fn)(p, wavs)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    pool = render_pool()
    losses = []
    t0 = time.time()
    for i in range(steps):
        if i and i % pool_refresh_steps == 0:
            tp = time.time()
            pool = render_pool()
            log.info("pool refresh at step %d (%.0fs)", i, time.time() - tp)
        wavs = draw_batch(pool)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(wavs))
        if (i + 1) % log_every == 0 or i == 0:
            losses.append(float(loss))
            log.info("proto step %d loss %.4f (%.1fs)", i + 1, float(loss),
                     time.time() - t0)

    # unseen-speaker probe: FRESH profiles, never in any pool
    probe_pool = render_pool()[:24, :2]
    flat = probe_pool.reshape(-1, n)
    emb = np.array(encode(params, jnp.asarray(flat)))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9
    lab = np.repeat(np.arange(probe_pool.shape[0]), probe_pool.shape[1])
    sim = emb @ emb.T
    same = lab[:, None] == lab[None, :]
    iu = np.triu_indices(len(lab), 1)
    sep = float(sim[iu][same[iu]].mean() - sim[iu][~same[iu]].mean())
    metrics = {"loss": losses, "unseen_separation": sep}
    log.info("unseen-speaker separation %.4f", sep)

    if n_hard_pairs:
        # hard-pair margin probe: FRESH near-collided pairs; margin =
        # within-speaker cos minus cross-pair cos (positive = separable
        # by a centroid split, the failing 60 s statistic)
        from .multicond import make_mc_speaker_bank as _bank

        margins = []
        for _ in range(12):
            a = _bank(rng, 1)[0]
            b = {"f0": a["f0"] * float(rng.uniform(0.97, 1.03)),
                 "shift": a["shift"],
                 "formants": np.asarray(a["formants"])
                 * rng.uniform(0.97, 1.03, 3)}
            ws = []
            for prof in (a, a, b, b):
                w = render_speaker(rng, prof, dur_s, sr)
                ws.append(np.pad(w[:n], (0, max(0, n - len(w[:n])))))
            e = np.array(encode(params, jnp.asarray(np.stack(ws))))
            e /= np.linalg.norm(e, axis=1, keepdims=True) + 1e-9
            within = 0.5 * (e[0] @ e[1] + e[2] @ e[3])
            cross = float(np.mean(e[:2] @ e[2:].T))
            margins.append(float(within - cross))
        metrics["hard_pair_margin"] = float(np.mean(margins))
        log.info("hard-pair margin %.4f", metrics["hard_pair_margin"])

    save_params = {k: v for k, v in params.items()
                   if k not in ("proto_scale", "proto_bias")}
    if out_path is not None:
        from ..models.port import save_params_npz

        save_params_npz(
            _flatten(save_params), out_path,
            meta={"streaming_stats": True, "net": {
                "n_mels": net.n_mels, "channels": net.channels,
                "emb_dim": net.emb_dim, "scale": net.scale,
                "se_channels": net.se_channels,
                "att_channels": net.att_channels,
                "dilations": list(net.dilations),
            }},
        )
    return params, metrics
