"""File-based checkpoint load paths, end-to-end (VERDICT r1 next-9).

Round 1 proved the port loaders against in-memory state_dicts only; the
actual file-on-disk → pipeline path had never run.  These tests serialize
oracle state_dicts to disk in the EXACT artifact formats the reference
consumes and drive the public load surfaces, so a real artifact is one
command away:

* SpeechBrain ECAPA ``embedding_model.ckpt`` (torch.save of a bare
  state_dict, ``/root/reference/speech_encode.py:64-70``) →
  ``registry.make_encoder("ecapa", weights=...)`` → CLI diarize → RTTM
* ERes2NetV2 / CAM++ ``.onnx`` (initializers keep torch parameter names,
  ``/root/reference/speech_encode.py:44-49``, ``diar_diag.py:141-157``) →
  ``load_eres2netv2`` / ``load_campp`` via the dependency-free
  ``io/onnx_lite`` reader (the onnx package is absent from this image)
* GTCRN ``model_trained_on_dns3.tar`` (torch tar with a ``model`` entry,
  ``/root/reference/gtcrn_wrap.py:10-15,156-161``) → CLI enhance
* ZipEnhancer ModelScope bin (wrapped ``model.generator.*`` state_dict,
  ``/root/reference/zipenhancer_pipe.py:119-125``) →
  ``load_zipenhancer_modelscope`` from disk
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# onnx_lite wire format
# --------------------------------------------------------------------------

class TestOnnxLite:
    def test_roundtrip_shapes_dtypes(self, tmp_path):
        from speech_diarization_tpu.io.onnx_lite import (
            read_initializers, write_initializers,
        )

        rng = np.random.default_rng(0)
        tensors = {
            "layer1.weight": rng.standard_normal((4, 3, 2)).astype(np.float32),
            "layer1.bias": rng.standard_normal(4).astype(np.float32),
            "bn.running_mean": rng.standard_normal(7).astype(np.float64),
            "steps": np.asarray([3, 1, 2], dtype=np.int64),
            "scalar": np.float32(2.5).reshape(()),
        }
        path = tmp_path / "m.onnx"
        write_initializers(path, tensors)
        out = read_initializers(path)
        assert set(out) == set(tensors)
        for k, v in tensors.items():
            assert out[k].shape == np.asarray(v).shape, k
            np.testing.assert_array_equal(out[k], v, err_msg=k)

    def test_readable_by_onnxruntime_schema_if_available(self, tmp_path):
        onnx = pytest.importorskip("onnx")
        from speech_diarization_tpu.io.onnx_lite import write_initializers

        path = tmp_path / "m.onnx"
        write_initializers(path, {"w": np.ones((2, 2), np.float32)})
        model = onnx.load(str(path))
        assert [i.name for i in model.graph.initializer] == ["w"]


# --------------------------------------------------------------------------
# ERes2NetV2 / CAM++ from .onnx files
# --------------------------------------------------------------------------

class TestOnnxCheckpointFiles:
    @pytest.mark.slow
    def test_eres2netv2_onnx_file(self, tmp_path):
        from speech_diarization_tpu.io.onnx_lite import write_initializers
        from speech_diarization_tpu.models.eres2netv2 import (
            ERes2NetV2, load_eres2netv2,
        )

        net = ERes2NetV2()
        man = net.manifest()
        rng = np.random.default_rng(1)
        sd = {k: (rng.standard_normal(v) * 0.05).astype(np.float32)
              for k, v in man.items()}
        # BN running stats must be valid
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        path = tmp_path / "iic-speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common.onnx"
        write_initializers(path, sd)
        params = load_eres2netv2(path, net)
        assert set(params) == set(man)
        np.testing.assert_allclose(
            np.asarray(params["conv1.weight"]), sd["conv1.weight"], rtol=0, atol=0)

    @pytest.mark.slow
    def test_campp_onnx_file(self, tmp_path):
        from speech_diarization_tpu.io.onnx_lite import write_initializers
        from speech_diarization_tpu.models.campp import CamPlusPlus, load_campp

        net = CamPlusPlus()
        man = net.manifest()
        rng = np.random.default_rng(2)
        sd = {k: (rng.standard_normal(v) * 0.05).astype(np.float32)
              for k, v in man.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        path = tmp_path / "campplus.onnx"
        write_initializers(path, sd)
        params = load_campp(path, net)
        assert set(params) == set(man)

    def test_eres2netv2_onnx_strict_mismatch_fails_loudly(self, tmp_path):
        from speech_diarization_tpu.io.onnx_lite import write_initializers
        from speech_diarization_tpu.models.eres2netv2 import (
            ERes2NetV2, load_eres2netv2,
        )

        path = tmp_path / "wrong.onnx"
        write_initializers(path, {"conv1.weight": np.ones((1, 1, 3, 3),
                                                          np.float32)})
        with pytest.raises(ValueError):
            load_eres2netv2(path, ERes2NetV2())


# --------------------------------------------------------------------------
# GTCRN model_trained_on_dns3.tar
# --------------------------------------------------------------------------

@pytest.mark.slow
class TestGtcrnTarFile:
    @pytest.fixture(scope="class")
    def tar_path(self, tmp_path_factory):
        from speech_diarization_tpu.models.gtcrn import gtcrn_init_params

        params = gtcrn_init_params(jax.random.PRNGKey(3))
        sd = {k: torch.from_numpy(np.array(v)) for k, v in params.items()}
        path = tmp_path_factory.mktemp("gtcrn") / "model_trained_on_dns3.tar"
        # the reference's exact layout: ckpt['model'] (gtcrn_wrap.py:13-15)
        torch.save({"model": sd, "optimizer": {}, "epoch": 37}, path)
        return path, params

    def test_load_matches_source(self, tar_path):
        from speech_diarization_tpu.models.port import load_gtcrn_checkpoint

        path, params = tar_path
        loaded = load_gtcrn_checkpoint(path)
        assert set(loaded) == set(params)
        for k in params:
            np.testing.assert_array_equal(np.asarray(loaded[k]),
                                          np.asarray(params[k]), err_msg=k)

    @pytest.mark.slow
    def test_cli_enhance_from_tar(self, tar_path, tmp_path):
        from speech_diarization_tpu import cli
        from speech_diarization_tpu.io.audio import write_wav

        path, _ = tar_path
        root = tmp_path / "audio"
        root.mkdir()
        rng = np.random.default_rng(4)
        write_wav(root / "a.wav",
                  (0.1 * rng.standard_normal(16000)).astype(np.float32), 16000)
        rc = cli.main(["enhance", str(root), "--backend", "gtcrn",
                       "--weights", str(path)])
        assert rc == 0
        out = root.with_name("audio-enhanced") / "a.wav"
        assert out.exists()


# --------------------------------------------------------------------------
# ZipEnhancer ModelScope bin from disk
# --------------------------------------------------------------------------

@pytest.mark.slow
class TestZipEnhancerBinFile:
    def test_load_from_disk_bin(self, tmp_path):
        from speech_diarization_tpu.models.port_zipenhancer import (
            load_zipenhancer_modelscope,
        )
        from speech_diarization_tpu.models.zipenhancer_ref import ZipEnhancerRef

        model = ZipEnhancerRef(
            n_fft=400, hop=100, dense_channel=16, num_tsblocks=1,
            num_layers=1, heads=2, query_head_dim=8, pos_head_dim=4,
            value_head_dim=8, pos_dim=16, feedforward_dim=48, conv_kernel=7)
        p = model.init(jax.random.PRNGKey(5))
        sd = {f"model.generator.{k}": torch.from_numpy(np.array(v))
              for k, v in p.items()}
        path = tmp_path / "pytorch_model.bin"
        torch.save({"state_dict": sd}, path)
        loaded = load_zipenhancer_modelscope(path, model)
        assert set(loaded) == set(p)


# --------------------------------------------------------------------------
# SpeechBrain ECAPA embedding_model.ckpt -> CLI diarize
# --------------------------------------------------------------------------

class TestEcapaCkptFile:
    @pytest.mark.slow
    def test_ckpt_file_to_cli_diarize(self, tmp_path):
        """The full reference flow: a SpeechBrain-format ckpt on disk feeds
        the flagship CLI and produces an RTTM (speaker labels are noise with
        random weights — the LOAD PATH is what's under test)."""
        from speech_diarization_tpu import cli
        from speech_diarization_tpu.io.audio import write_wav
        from speech_diarization_tpu.models.port_ecapa import ecapa_torch_manifest
        from speech_diarization_tpu.train.synthetic import make_conversation

        man = ecapa_torch_manifest()
        rng = np.random.default_rng(6)
        sd = {}
        for k, shape in man.items():
            a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
            if k.endswith("running_var"):
                a = np.abs(a) + 1.0
            sd[k] = torch.from_numpy(a)
        ckpt = tmp_path / "embedding_model.ckpt"
        torch.save(sd, ckpt)

        wav, _ = make_conversation(np.random.default_rng(7), 8.0,
                                   n_speakers=2, sr=16000)
        apath = tmp_path / "conv.wav"
        write_wav(apath, wav, 16000)
        out = tmp_path / "out"
        rc = cli.main(["diarize", str(apath), "--out-dir", str(out),
                       "--encoder-weights", str(ckpt), "--format", "rttm"])
        assert rc == 0
        rttm = out / "conv.rttm"
        assert rttm.exists() and rttm.read_text().startswith("SPEAKER")


# --------------------------------------------------------------------------
# f16 checkpoint compression (shipped-weight size control)
# --------------------------------------------------------------------------

class TestF16Compression:
    def test_save_f16_load_f32_roundtrip(self, tmp_path):
        """store_dtype=float16 halves the bytes; load_params_npz upcasts so
        consumers always see float32 (ints and __meta__ untouched)."""
        from speech_diarization_tpu.models.port import (
            load_params_meta, load_params_npz, save_params_npz,
        )

        rng = np.random.default_rng(0)
        params = {
            "w": rng.standard_normal((64, 64)).astype(np.float32),
            "steps": np.array([3], dtype=np.int64),
        }
        p32, p16 = tmp_path / "w32.npz", tmp_path / "w16.npz"
        save_params_npz(params, p32, meta={"net": {"emb_dim": 8}})
        save_params_npz(params, p16, meta={"net": {"emb_dim": 8}},
                        store_dtype=np.float16)
        assert p16.stat().st_size < 0.6 * p32.stat().st_size

        loaded = load_params_npz(p16)
        assert loaded["w"].dtype == jnp.float32
        assert jnp.issubdtype(loaded["steps"].dtype, jnp.integer)
        np.testing.assert_allclose(np.asarray(loaded["w"]), params["w"],
                                   rtol=1e-3, atol=1e-3)
        assert load_params_meta(p16) == {"net": {"emb_dim": 8}}

    def test_compress_script_preserves_meta_and_values(self, tmp_path):
        from scripts.compress_weights import compress
        from speech_diarization_tpu.models.port import (
            load_params_meta, load_params_npz, save_params_npz,
        )

        rng = np.random.default_rng(1)
        params = {"a": rng.standard_normal((128, 32)).astype(np.float32)}
        path = tmp_path / "enc.npz"
        save_params_npz(params, path, meta={"streaming_stats": True})
        before, after, err = compress(path)
        assert after < 0.6 * before and err < 1e-2
        loaded = load_params_npz(path)
        np.testing.assert_allclose(np.asarray(loaded["a"]), params["a"],
                                   rtol=1e-3, atol=1e-3)
        assert load_params_meta(path) == {"streaming_stats": True}
