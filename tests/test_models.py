"""Shape/jit/behavior tests for the VAD and ECAPA models."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models.vad import VadModel, VadNet, energy_vad_probs
from speech_diarization_tpu.models.ecapa import EcapaModel, EcapaTdnn


class TestVad:
    @pytest.mark.slow
    def test_shapes_and_range(self):
        model = VadModel()
        params = model.init(jax.random.PRNGKey(0))
        y = jnp.asarray(np.random.default_rng(0).standard_normal(16000, ).astype(np.float32))
        p = np.asarray(model.probs(params, y))
        assert p.shape == (16000 // 160 + 1,)
        assert (p >= 0).all() and (p <= 1).all()

    def test_jit_and_batch(self):
        model = VadModel()
        params = model.init(jax.random.PRNGKey(0))
        f = jax.jit(model.probs)
        y = jnp.zeros((2, 8000))
        p = np.asarray(f(params, y))
        assert p.shape == (2, 8000 // 160 + 1)

    def test_causality(self):
        """Conv stack is left-padded and the GRU runs forward: probs on a
        shared prefix must not depend on the suffix."""
        model = VadModel()
        params = model.init(jax.random.PRNGKey(1))
        g = np.random.default_rng(2)
        a = g.standard_normal(8000).astype(np.float32)
        y1 = np.concatenate([a, g.standard_normal(8000).astype(np.float32)])
        y2 = np.concatenate([a, 0.5 * g.standard_normal(8000).astype(np.float32)])
        p1 = np.asarray(model.probs(params, jnp.asarray(y1)))
        p2 = np.asarray(model.probs(params, jnp.asarray(y2)))
        # frames fully inside the prefix (accounting for 25ms window + reflect pad)
        n_safe = (8000 - 400) // 160 - 2
        np.testing.assert_allclose(p1[:n_safe], p2[:n_safe], atol=1e-5)

    def test_energy_vad_separates_tone_from_silence(self):
        sr = 16000
        tone = 0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        sil = 0.001 * np.random.default_rng(0).standard_normal(sr)
        y = np.concatenate([sil, tone, sil]).astype(np.float32)
        p = np.asarray(energy_vad_probs(jnp.asarray(y)))
        n = sr // 160
        assert p[n + 10 : 2 * n - 10].mean() > 0.9
        assert p[10 : n - 10].mean() < 0.1
        assert p[2 * n + 10 : 3 * n - 10].mean() < 0.1


class TestVadConv:
    """Scan-free TCN VAD (models/vad.VadConvNet) — the fast batch backend."""

    @pytest.mark.slow
    def test_shapes_and_range(self):
        from speech_diarization_tpu.models.vad import VadConvNet

        model = VadModel(VadConvNet())
        params = model.init(jax.random.PRNGKey(0))
        y = jnp.asarray(
            np.random.default_rng(0).standard_normal(16000).astype(np.float32))
        p = np.asarray(model.probs(params, y))
        assert p.shape == (16000 // 160 + 1,)
        assert (p >= 0).all() and (p <= 1).all()

    def test_causality(self):
        from speech_diarization_tpu.models.vad import VadConvNet

        model = VadModel(VadConvNet())
        params = model.init(jax.random.PRNGKey(1))
        g = np.random.default_rng(2)
        a = g.standard_normal(24000).astype(np.float32)
        y1 = np.concatenate([a, g.standard_normal(8000).astype(np.float32)])
        y2 = np.concatenate([a, 0.5 * g.standard_normal(8000).astype(np.float32)])
        p1 = np.asarray(model.probs(params, jnp.asarray(y1)))
        p2 = np.asarray(model.probs(params, jnp.asarray(y2)))
        n_safe = (24000 - 400) // 160 - 2
        np.testing.assert_allclose(p1[:n_safe], p2[:n_safe], atol=1e-5)

    def test_train_save_load_roundtrip(self, tmp_path):
        from speech_diarization_tpu.train.recipes import (
            load_vad, train_vad_synthetic,
        )

        out = tmp_path / "vad_conv.npz"
        params, _ = train_vad_synthetic(steps=2, batch=2, dur_s=1.0,
                                        arch="conv", out_path=out)
        model, loaded = load_vad(out)
        from speech_diarization_tpu.models.vad import VadConvNet

        assert isinstance(model.net, VadConvNet)
        y = jnp.asarray(
            np.random.default_rng(0).standard_normal(8000).astype(np.float32))
        p1 = np.asarray(model.probs(params, y))
        p2 = np.asarray(model.probs(loaded, y))
        np.testing.assert_allclose(p1, p2, atol=1e-6)


class TestEcapa:
    @pytest.fixture(scope="class")
    def small(self):
        net = EcapaTdnn(n_mels=20, channels=64, emb_dim=32, scale=4,
                        se_channels=16, att_channels=16)
        model = EcapaModel(net)
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    @pytest.mark.slow
    def test_embedding_shape(self, small):
        model, params = small
        wavs = jnp.asarray(np.random.default_rng(0)
                           .standard_normal((3, 16000)).astype(np.float32))
        emb = np.asarray(model.encode_batch(params, wavs))
        assert emb.shape == (3, 32)
        assert np.isfinite(emb).all()

    def test_jit_stable(self, small):
        model, params = small
        f = jax.jit(model.encode_batch)
        wavs = jnp.asarray(np.random.default_rng(1)
                           .standard_normal((2, 8000)).astype(np.float32))
        e1 = np.asarray(f(params, wavs))
        e2 = np.asarray(f(params, wavs))
        np.testing.assert_allclose(e1, e2, atol=1e-5)

    def test_time_invariance_of_identity(self, small):
        """Same signal shifted should produce nearby embeddings (pooling over
        time); different signals should differ more."""
        model, params = small
        g = np.random.default_rng(3)
        sr = 16000
        t = np.arange(2 * sr) / sr
        v1 = (np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        v2 = (g.standard_normal(2 * sr)).astype(np.float32)
        wavs = jnp.asarray(np.stack([v1[: sr], v1[sr // 2: sr // 2 + sr], v2[:sr]]))
        emb = np.asarray(model.encode_batch(params, wavs))
        norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sim_same = norm[0] @ norm[1]
        sim_diff = norm[0] @ norm[2]
        assert sim_same > sim_diff

    @pytest.mark.slow
    def test_full_size_param_count(self):
        net = EcapaTdnn()
        params = net.init(jax.random.PRNGKey(0))
        n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
        # speechbrain ECAPA-TDNN (C=512) is ~6.2M params; ours should be same
        # order of magnitude (exact layout differs in BN bookkeeping)
        assert 4e6 < n < 9e6
