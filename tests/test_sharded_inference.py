"""Sharded single-file inference == single-device inference, on the
8-virtual-device CPU mesh (VERDICT r1 weak #7: the dp window-grid sharding
of SURVEY.md §2.3, tested for numerical equality)."""
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.config import AudioConfig, ClusterConfig, DiarizationConfig, EmbedConfig
from speech_diarization_tpu.models.ecapa import EcapaModel, EcapaTdnn
from speech_diarization_tpu.parallel import make_mesh, make_sharded_encode_fn
from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
from speech_diarization_tpu.train.synthetic import make_tone_conversation

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)


@pytest.fixture(scope="module")
def small_ecapa():
    net = EcapaTdnn(n_mels=24, channels=64, emb_dim=32, scale=4,
                    se_channels=16, att_channels=16)
    model = EcapaModel(net)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestShardedEncode:
    def test_matches_single_device(self, small_ecapa):
        model, params = small_ecapa
        mesh = make_mesh(n_devices=8)
        sharded = make_sharded_encode_fn(model, params, mesh)
        single = jax.jit(partial(model.encode_batch, params))

        wavs = np.random.default_rng(0).standard_normal((16, 16000)).astype(np.float32)
        a = np.asarray(sharded(jnp.asarray(wavs)))
        b = np.asarray(single(jnp.asarray(wavs)))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_tp_sharded_params(self, small_ecapa):
        model, params = small_ecapa
        mesh = make_mesh(n_devices=8, tp=2)
        sharded = make_sharded_encode_fn(
            model, params, mesh, tp_patterns=("mfa", "fc_w"))
        single = jax.jit(partial(model.encode_batch, params))
        wavs = np.random.default_rng(1).standard_normal((8, 16000)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(sharded(jnp.asarray(wavs))),
            np.asarray(single(jnp.asarray(wavs))), atol=1e-4, rtol=1e-4)


class TestShardedPipeline:
    def test_pipeline_outputs_identical(self, small_ecapa):
        """Full flagship pipeline: sharded window grid == single device."""
        model, params = small_ecapa
        mesh = make_mesh(n_devices=8)

        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc", max_speakers=6),
            embed=EmbedConfig(batch_size=64),  # still divisible by dp=8
        )
        wave, _ = make_tone_conversation(0)

        single = DiarizationPipeline(
            cfg, encode_fn=jax.jit(partial(model.encode_batch, params)))
        sharded = DiarizationPipeline(
            cfg, encode_fn=make_sharded_encode_fn(model, params, mesh))

        r1 = single((wave, 16000))
        r2 = sharded((wave, 16000))
        np.testing.assert_allclose(r1.segments.starts, r2.segments.starts, atol=1e-6)
        np.testing.assert_allclose(r1.segments.ends, r2.segments.ends, atol=1e-6)
        np.testing.assert_array_equal(r1.segments.spks, r2.segments.spks)


class TestCorpusShardedMode:
    def test_few_files_many_chips_routes_to_sharded(self, small_ecapa, tmp_path):
        from speech_diarization_tpu.pipelines.corpus import corpus_diarize

        model, params = small_ecapa
        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc", max_speakers=6),
            embed=EmbedConfig(batch_size=64),
        )
        wave, _ = make_tone_conversation(1)
        report = corpus_diarize(
            [(wave, 16000)], cfg,
            encode_model=model, encode_params=params,
        )
        assert len(report.files) == 1 and not report.errors
        assert report.files[0]["device"].startswith("sharded[")
        assert report.files[0]["segments"] > 0
