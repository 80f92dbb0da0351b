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


class TestPallasAspUnderSharding:
    """VERDICT r3 weak-8: the fused Pallas grid-ASP kernel composed with a
    device mesh.  Interpret-mode kernel on the 8-virtual-device CPU mesh
    (Mosaic has no CPU lowering); the real-Mosaic on-chip analog runs in the
    bench tail (bench._sharded_asp_check) and asserts the same equality."""

    def test_pallas_asp_inside_shard_map(self, small_ecapa):
        import inspect

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        # jax 0.8+ renamed check_rep -> check_vma (same handling as bench.py)
        _p = inspect.signature(shard_map).parameters
        _extra = ({"check_rep": False} if "check_rep" in _p
                  else {"check_vma": False} if "check_vma" in _p else {})

        model, params = small_ecapa
        net = model.net
        mesh = make_mesh(n_devices=8)

        hop_f, win_f, n_win = 8, 21, 16
        t_f = (n_win - 1) * hop_f + win_f + 3
        cc = None
        # derive CC from a tiny trunk pass so the feature shape is the real one
        feats = jnp.zeros((1, t_f, net.n_mels), jnp.float32)
        cc = np.asarray(net.trunk(params, feats)).shape[1]

        x = np.random.default_rng(0).standard_normal((8, cc, t_f)).astype(np.float32)

        def one(xb):  # xb: [1, CC, T_f] per device
            return net.asp_head_grid_pallas(
                params, xb[0], 0, hop_f, win_f, n_win, interpret=True)[None]

        sharded = jax.jit(shard_map(
            one, mesh=mesh, in_specs=P("dp", None, None),
            out_specs=P("dp", None, None), **_extra))
        out_s = np.asarray(sharded(jnp.asarray(x)))

        ref_fn = jax.jit(lambda xi: net.asp_head_grid(
            params, xi, 0, hop_f, win_f, n_win))
        out_r = np.stack([np.asarray(ref_fn(jnp.asarray(x[i])))
                          for i in range(8)])

        a = out_s.reshape(-1, out_s.shape[-1])
        b = out_r.reshape(-1, out_r.shape[-1])
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
        assert cos.min() > 0.999, cos.min()
