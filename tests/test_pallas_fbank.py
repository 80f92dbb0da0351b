"""Fused Pallas fbank kernel vs the jnp reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from speech_diarization_tpu.dsp.mel import log_mel_spectrogram
from speech_diarization_tpu.ops.pallas.fused_fbank import fused_log_mel

SR = 16000


@pytest.mark.parametrize("n_samples", [16000, 40000])
def test_matches_jnp_path(n_samples):
    g = np.random.default_rng(0)
    y = (0.3 * g.standard_normal(n_samples)).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y)[None], sample_rate=SR))[0]
    out = np.asarray(fused_log_mel(jnp.asarray(y), sample_rate=SR,
                                   tile_n=64, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_tone_content():
    t = np.arange(SR) / SR
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = np.asarray(fused_log_mel(jnp.asarray(y), tile_n=64, interpret=True))
    peak = out.mean(axis=0).argmax()
    assert 25 <= peak <= 50


def test_batched_matches_jnp_path():
    g = np.random.default_rng(1)
    y = (0.3 * g.standard_normal((3, 16000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), sample_rate=SR))
    out = np.asarray(fused_log_mel(jnp.asarray(y), sample_rate=SR,
                                   tile_n=64, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_backend_gate_routes_to_fused(monkeypatch):
    monkeypatch.setenv("SDTPU_FBANK_BACKEND", "fused")
    # interpret mode is not plumbed through the gate; just check the gate
    # resolves (on CPU the fused kernel runs via the pallas CPU lowering)
    g = np.random.default_rng(2)
    y = (0.3 * g.standard_normal((2, 8000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), backend="matmul"))
    out = np.asarray(log_mel_spectrogram(jnp.asarray(y)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)
