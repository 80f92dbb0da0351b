"""Streaming trunk-shared ECAPA grid (models/ecapa.encode_grid_chunk,
segment/embed.embed_windows_streaming).

The dense 1 s / 100 ms embedding grid overlaps 10-fold, so the per-window
forward recomputes every trunk FLOP ~10x; streaming mode runs the trunk once
with sliding statistics and pools per window.  These tests pin down:
  * chunk-stitching invariance (margins >= the trunk receptive field, so the
    chunk decomposition is invisible in the output);
  * agreement with the per-window (windowed) grid on trained weights — not
    bit-equality (the two modes define window statistics differently, by
    design) but high per-window cosine agreement and identical downstream
    clustering structure;
  * the trunk/asp_head refactor being a pure split of the old apply().
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models.ecapa import EcapaModel, EcapaTdnn
from speech_diarization_tpu.segment.embed import (
    embed_windows,
    embed_windows_streaming,
)

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)

SR = 16000
WEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "ecapa_synthetic.npz"


def small_model(seed: int = 0):
    net = EcapaTdnn(n_mels=40, channels=64, emb_dim=32, scale=4,
                    se_channels=16, att_channels=16)
    model = EcapaModel(net)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


def speech_like(dur_s: float, seed: int = 0) -> np.ndarray:
    from speech_diarization_tpu.train.synthetic import make_conversation

    wave, _ = make_conversation(np.random.default_rng(seed), dur_s,
                                n_speakers=2, sr=SR)
    return wave.astype(np.float32)


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    na = a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-9)
    nb = b / (np.linalg.norm(b, axis=1, keepdims=True) + 1e-9)
    return np.sum(na * nb, axis=1)


def test_trunk_asp_split_is_pure_refactor():
    model, params = small_model()
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 120, 40)).astype(np.float32))
    full = model.net.apply(params, feats)
    split = model.net.asp_head(params, model.net.trunk(params, feats))
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-6)


def test_asp_head_grid_matches_windowed_asp_head():
    """The decomposed sliding-grid ASP (prefix-sum window stats + shared
    attention-x term, models/ecapa.asp_head_grid) must equal asp_head over
    the explicitly framed windows — it is an algebraic restructuring for
    HBM, not a semantic change."""
    from speech_diarization_tpu.dsp.framing import frame_signal

    model, params = small_model()
    cc = model.net.cat_channels
    t_f, win_f, hop_f, first, n_win = 260, 101, 10, 20, 12
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((cc, t_f)).astype(np.float32))
    xw = frame_signal(x, win_f, hop_f, pad_tail=False)
    xw = jnp.swapaxes(xw, 0, 1)[first // hop_f:][:n_win]
    old = model.net.asp_head(params, xw)
    new = model.net.asp_head_grid(params, x, first, hop_f, win_f, n_win)
    np.testing.assert_allclose(np.asarray(old), np.asarray(new), atol=1e-5)


def test_streaming_chunk_stitching_invariance():
    """Different chunk sizes must give the same grid — margins cover the
    trunk receptive field + sliding-stat windows."""
    model, params = small_model()
    y = jnp.asarray(speech_like(30.0))
    a = embed_windows_streaming(model, params, y, SR, 1.0, 0.1,
                                windows_per_chunk=64)
    b = embed_windows_streaming(model, params, y, SR, 1.0, 0.1,
                                windows_per_chunk=150)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_streaming_chunk_stitching_invariance_2s_grid():
    """Same invariance at the round-3 default 2 s grid geometry (wider
    sliding-stat spans eat more of the margin)."""
    model, params = small_model()
    y = jnp.asarray(speech_like(30.0, seed=1))
    a = embed_windows_streaming(model, params, y, SR, 2.0, 0.1,
                                windows_per_chunk=64)
    b = embed_windows_streaming(model, params, y, SR, 2.0, 0.1,
                                windows_per_chunk=150)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_streaming_window_count_matches_windowed():
    model, params = small_model()
    for dur in (4.0, 10.0, 17.3):
        y = jnp.asarray(speech_like(dur))
        enc = jax.jit(lambda w: model.encode_batch(params, w))
        w = embed_windows(enc, y, SR, 1.0, 0.1, batch=64)
        s = embed_windows_streaming(model, params, y, SR, 1.0, 0.1)
        assert s.shape == w.shape


@pytest.mark.skipif(not WEIGHTS.exists(), reason="shipped weights missing")
def test_streaming_agrees_with_windowed_on_trained_weights():
    """Per-window cosine agreement on per-window-trained weights.

    The two modes intentionally differ (window-local vs sliding statistics,
    reflect pad vs real context) — measured mean cosine is ~0.95; the gate
    here catches regressions in the streaming math, not semantic identity.
    Full DER parity requires streaming-trained weights (grid_backend='auto'
    only engages streaming for those, pipelines/diarize.py).
    """
    from speech_diarization_tpu.train.recipes import load_speaker_encoder

    model, params = load_speaker_encoder(WEIGHTS)
    y = jnp.asarray(speech_like(20.0, seed=3))
    enc = jax.jit(lambda w: model.encode_batch(params, w))
    w_embs = embed_windows(enc, y, SR, 1.0, 0.1, batch=64)
    s_embs = embed_windows_streaming(model, params, y, SR, 1.0, 0.1)
    cos = cosine_rows(w_embs, s_embs)
    assert float(np.mean(cos)) > 0.90, float(np.mean(cos))


@pytest.mark.skipif(not WEIGHTS.exists(), reason="shipped weights missing")
def test_pipeline_streaming_backend_smoke():
    """Flagship pipeline runs end-to-end with grid_backend=streaming and
    auto resolves to windowed for per-window-trained weights."""
    from dataclasses import replace

    from speech_diarization_tpu.config import DiarizationConfig
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.synthetic import make_conversation

    wave, _ = make_conversation(np.random.default_rng(7), 30.0,
                                n_speakers=2, sr=SR)

    cfg = DiarizationConfig()
    cfg_s = replace(cfg, embed=replace(cfg.embed, grid_backend="streaming"))
    out = DiarizationPipeline(cfg_s)((wave, SR))
    assert len(out.segments) >= 1 and out.num_speakers >= 1

    # auto must NOT resolve to streaming for per-window-trained weights
    from speech_diarization_tpu.train.recipes import load_speaker_encoder

    model, _params = load_speaker_encoder(WEIGHTS)
    assert getattr(model, "streaming_trained", False) is False
