"""Corpus runner tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.config import AudioConfig, ClusterConfig, DiarizationConfig
from speech_diarization_tpu.pipelines.corpus import corpus_diarize


def _fake_encoder(wavs):
    w = np.asarray(wavs)
    spec = np.abs(np.fft.rfft(w, axis=1))
    bands = np.array_split(np.arange(spec.shape[1]), 16)
    feats = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
    return jnp.asarray(feats.astype(np.float32))


def _wave(seed=0, sr=16000):
    g = np.random.default_rng(seed)
    parts = []
    for f in (180.0, 850.0):
        parts.append(np.zeros(int(0.5 * sr), np.float32))
        t = np.arange(int(3.0 * sr)) / sr
        parts.append((0.3 * np.sin(2 * np.pi * f * t)
                      + 0.005 * g.standard_normal(len(t))).astype(np.float32))
    return np.concatenate(parts)


@pytest.mark.slow
def test_multi_device_corpus(tmp_path):
    cfg = DiarizationConfig(
        audio=AudioConfig(target_lufs=None, preemphasis=None),
        cluster=ClusterConfig(method="ahc"),
    )
    sources = [(_wave(i), 16000) for i in range(6)]
    report = corpus_diarize(sources, cfg, devices=jax.devices()[:4],
                            encode_fn=_fake_encoder)
    assert len(report.files) == 6
    assert not report.errors
    assert report.audio_s > 6 * 6
    devs = {f["device"] for f in report.files}
    assert len(devs) >= 2  # work actually spread across devices
    assert report.summary()["rtf"] > 0


def test_failure_isolation(tmp_path):
    cfg = DiarizationConfig(audio=AudioConfig(target_lufs=None, preemphasis=None),
                            cluster=ClusterConfig(method="ahc"))
    sources = [(_wave(0), 16000), str(tmp_path / "missing.wav"), (_wave(1), 16000)]
    report = corpus_diarize(sources, cfg, devices=jax.devices()[:2],
                            encode_fn=_fake_encoder)
    assert len(report.files) == 2
    assert len(report.errors) == 1
    assert "missing.wav" in report.errors[0]["source"]


@pytest.mark.slow
class TestCrossFilePipelining:
    """Round-4 corpus worker change (VERDICT r3 #3): array sources with the
    streamed ingest dispatch file i+1's chunks before file i's finish.  The
    pipelined corpus output must equal per-file direct pipeline calls."""

    def test_pipelined_equals_direct(self):
        from pathlib import Path

        from speech_diarization_tpu.train.recipes import (
            load_speaker_encoder, load_vad,
        )

        wroot = Path(__file__).resolve().parents[1] / "weights"
        enc = wroot / "ecapa_robust_stream.npz"
        vadw = wroot / "vad_conv_mc.npz"
        if not enc.exists() or not vadw.exists():
            pytest.skip("shipped weights absent")
        from functools import partial

        from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline

        model, params = load_speaker_encoder(enc)
        vad, vp = load_vad(vadw)
        cfg = DiarizationConfig(cluster=ClusterConfig(method="spectral"))

        def factory():
            return DiarizationPipeline(
                cfg, encoder=(model, params),
                vad_probs_fn=jax.jit(partial(vad.probs, vp)))

        from speech_diarization_tpu.train.synthetic import make_conversation

        sources = []
        for i in range(3):
            rng = np.random.default_rng(100 + i)
            w, _ = make_conversation(rng, 61.0, n_speakers=2, sr=16000)
            sources.append((np.asarray(w, np.float32), 16000))

        pipe = factory()
        assert pipe.streaming_capable()
        direct = [pipe(s) for s in sources]

        report = corpus_diarize(sources, cfg, devices=jax.devices()[:1],
                                pipeline_factory=factory, keep_results=True)
        assert not report.errors and len(report.files) == 3
        for f in sorted(report.files, key=lambda f: f["index"]):
            d = direct[f["index"]]
            r = f["result"]
            assert r.num_speakers == d.num_speakers
            np.testing.assert_allclose(r.segments.starts, d.segments.starts)
            np.testing.assert_allclose(r.segments.ends, d.segments.ends)
            assert list(r.segments.spks) == list(d.segments.spks)
