"""Port-layer dress rehearsal (VERDICT r3 #7): the real-artifact loader paths
have never executed under zero egress, so each foreign CHECKPOINT FILE FORMAT
is synthesized here — torch tar/ckpt pickles via the installed torch, ONNX
protos via io/onnx_lite, demucs ``.th`` with pickled architecture kwargs,
ModelScope wrapper prefixes — written to disk, round-tripped through the
path-based ``port_*`` entry points, and diffed against the source arrays plus
one activation forward.  This proves the port layer end-to-end (file ->
state_dict -> key map -> JAX tree -> graph), not just per-primitive parity:

  * GTCRN DNS3 tar:        ``gtcrn_wrap.py:10-15`` (``ckpt['model']``)
  * SpeechBrain ECAPA ckpt: ``speech_encode.py:64-70``
  * ERes2NetV2 ONNX:        ``speech_encode.py:44-49``
  * ModelScope ZipEnhancer: ``zipenhancer_pipe.py:119-125``
  * MVSEP HTDemucs ``.th``:  ``dialog-demix.py:31-40``
"""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # file IO + forwards; full suite only


def _rand_tree(manifest: dict, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in manifest.items():
        v = 0.1 * rng.standard_normal(shape)
        if "var" in k.rsplit(".", 1)[-1]:  # BN running_var must be > 0
            v = np.abs(v) + 0.5
        out[k] = np.asarray(v, np.float32)
    return out


def _assert_trees_equal(a: dict, b: dict) -> None:
    a, b = _flatten(a), _flatten(b)
    assert set(a) == set(b), (sorted(set(a) - set(b))[:5],
                              sorted(set(b) - set(a))[:5])
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def _flatten(tree, prefix=""):
    # JAX param trees here nest dicts AND lists of dicts (e.g. res2 scales)
    out = {}
    if isinstance(tree, (list, tuple)):
        tree = {str(i): v for i, v in enumerate(tree)}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


class TestGtcrnTarRoundtrip:
    def test_dns3_tar_format(self, tmp_path):
        from speech_diarization_tpu.models.gtcrn import GTCRN, gtcrn_init_params
        from speech_diarization_tpu.models.port import load_gtcrn_checkpoint

        src = gtcrn_init_params(jax.random.PRNGKey(0))
        ckpt = {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in src.items()},
                "optimizer": {}, "epoch": 17}
        path = tmp_path / "model_trained_on_dns3.tar"
        torch.save(ckpt, str(path))

        loaded = load_gtcrn_checkpoint(path)
        _assert_trees_equal({k: np.asarray(v) for k, v in src.items()}, loaded)

        spec = jnp.asarray(np.random.default_rng(1)
                           .standard_normal((1, 257, 10, 2)).astype(np.float32))
        out = jax.jit(GTCRN().apply)(loaded, spec)
        assert out.shape == spec.shape and bool(jnp.all(jnp.isfinite(out)))


class TestEcapaSpeechbrainRoundtrip:
    CFG = dict(n_mels=24, channels=64, emb_dim=32, scale=4, se_channels=16,
               att_channels=16)

    def test_embedding_model_ckpt(self, tmp_path):
        from speech_diarization_tpu.models.ecapa import EcapaTdnn
        from speech_diarization_tpu.models.port_ecapa import (
            ecapa_torch_manifest, load_ecapa_speechbrain,
        )

        net = EcapaTdnn(**self.CFG)
        sd = _rand_tree(ecapa_torch_manifest(net), seed=2)
        # SpeechBrain saves the embedding model as a bare state_dict pickle
        path = tmp_path / "embedding_model.ckpt"
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))

        from_file = load_ecapa_speechbrain(path, net=net)
        from_mem = load_ecapa_speechbrain(sd, net=net)
        _assert_trees_equal(_flatten(from_file), _flatten(from_mem))

        feats = jnp.asarray(np.random.default_rng(3)
                            .standard_normal((2, 50, self.CFG["n_mels"]))
                            .astype(np.float32))
        emb = jax.jit(net.apply)(from_file, feats)
        assert emb.shape == (2, self.CFG["emb_dim"])
        assert bool(jnp.all(jnp.isfinite(emb)))


class TestERes2NetV2OnnxRoundtrip:
    CFG = dict(n_mels=32, m_channels=8, base_width=16, scale=2, expansion=2,
               num_blocks=(1, 1, 2, 1), emb_dim=32)

    def test_onnx_initializer_format(self, tmp_path):
        from speech_diarization_tpu.io.onnx_lite import write_initializers
        from speech_diarization_tpu.models.eres2netv2 import (
            ERes2NetV2, load_eres2netv2,
        )

        net = ERes2NetV2(**self.CFG)
        sd = _rand_tree(net.manifest(), seed=4)
        path = tmp_path / "eres2netv2.onnx"
        write_initializers(path, sd)

        from_file = load_eres2netv2(path, net=net)
        _assert_trees_equal(sd, {k: np.asarray(v) for k, v in from_file.items()})

        feats = jnp.asarray(np.random.default_rng(5)
                            .standard_normal((1, 60, self.CFG["n_mels"]))
                            .astype(np.float32))
        emb = jax.jit(net.apply)(from_file, feats)
        assert emb.shape == (1, self.CFG["emb_dim"])
        assert bool(jnp.all(jnp.isfinite(emb)))

    def test_onnx_real_package_interop(self, tmp_path):
        """The minimal proto our writer emits must be readable by the real
        ``onnx`` package when it is installed (skip otherwise)."""
        onnx = pytest.importorskip("onnx")
        from onnx import numpy_helper

        from speech_diarization_tpu.io.onnx_lite import write_initializers

        tensors = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
        path = tmp_path / "tiny.onnx"
        write_initializers(path, tensors)
        m = onnx.load(str(path))
        got = {i.name: numpy_helper.to_array(i) for i in m.graph.initializer}
        np.testing.assert_array_equal(got["a.weight"], tensors["a.weight"])


class TestZipEnhancerModelscopeRoundtrip:
    def test_wrapped_prefixed_checkpoint(self, tmp_path):
        import speech_diarization_tpu.models.zipenhancer_ref as zr
        from speech_diarization_tpu.models.port_zipenhancer import (
            load_zipenhancer_modelscope, zipenhancer_manifest,
        )

        model = zr.ZipEnhancerRef(
            n_fft=400, hop=100, dense_channel=16, num_tsblocks=1, num_layers=1,
            heads=2, query_head_dim=8, pos_head_dim=4, value_head_dim=8,
            pos_dim=16, feedforward_dim=48, conv_kernel=7)
        sd = _rand_tree(zipenhancer_manifest(model), seed=6)
        # ModelScope bundles wrap the generator under a prefix inside a
        # {'state_dict': ...} pickle; the loader must peel both
        wrapped = {f"generator.{k}": torch.from_numpy(v) for k, v in sd.items()}
        path = tmp_path / "pytorch_model.bin"
        torch.save({"state_dict": wrapped}, str(path))

        loaded = load_zipenhancer_modelscope(path, model=model)
        _assert_trees_equal(sd, {k: np.asarray(v) for k, v in loaded.items()})

        wav = jnp.asarray(np.random.default_rng(7)
                          .standard_normal((1, 2000)).astype(np.float32) * 0.1)
        out = jax.jit(model.apply)(loaded, wav)
        assert out.shape[-1] == wav.shape[-1]
        assert bool(jnp.all(jnp.isfinite(out)))


class TestHTDemucsThRoundtrip:
    def test_th_with_pickled_kwargs(self, tmp_path):
        from speech_diarization_tpu.models.demucs_ref import HTDemucsRef
        from speech_diarization_tpu.models.port_demucs import load_htdemucs

        kwargs = dict(sources=["music", "effect", "dialog"], channels=8,
                      depth=3, nfft=512, bottom_channels=16, t_layers=3,
                      t_heads=2, lr=3e-4, optim="adam")  # training-only extras
        tiny = HTDemucsRef(sources=("music", "effect", "dialog"), channels=8,
                           depth=3, nfft=512, bottom_channels=16, t_layers=3,
                           t_heads=2)
        src = tiny.init(jax.random.PRNGKey(8))
        ckpt = {
            "klass": None, "args": (),
            "kwargs": kwargs,
            "state": {k: torch.from_numpy(np.asarray(v)) for k, v in src.items()},
        }
        path = tmp_path / "97d170e1-roundtrip.th"
        torch.save(ckpt, str(path))

        model, loaded = load_htdemucs(path)   # arch comes from the kwargs
        assert model.channels == 8 and model.nfft == 512
        assert model.sources == ("music", "effect", "dialog")
        _assert_trees_equal({k: np.asarray(v) for k, v in src.items()},
                            {k: np.asarray(v) for k, v in loaded.items()})

        x = jnp.asarray(np.random.default_rng(9)
                        .standard_normal((1, 2, 4000)).astype(np.float32))
        y = jax.jit(model.apply)(loaded, x)
        assert y.shape == (1, 3, 2, 4000)
        assert bool(jnp.all(jnp.isfinite(y)))
