"""Training-step tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models.ecapa import EcapaTdnn
from speech_diarization_tpu.parallel.mesh import make_mesh
from speech_diarization_tpu.train.steps import (
    make_ecapa_train_step,
    make_gtcrn_train_step,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_devices=8, tp=2)


class TestEcapaTraining:
    def test_loss_decreases(self, mesh):
        net = EcapaTdnn(n_mels=20, channels=64, emb_dim=32, scale=4,
                        se_channels=16, att_channels=16)
        init_fn, step_fn, shard_state = make_ecapa_train_step(mesh, net, n_classes=8)
        state = shard_state(init_fn(jax.random.PRNGKey(0)))
        g = np.random.default_rng(0)
        wavs = g.standard_normal((8, 4000)).astype(np.float32)
        labels = g.integers(0, 8, size=8)
        losses = []
        for _ in range(4):
            state, loss = step_fn(state, wavs, labels)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_mesh_shapes(self, mesh):
        assert mesh.shape == {"dp": 4, "tp": 2}


class TestGtcrnTraining:
    def test_one_step_finite(self, mesh):
        init_fn, step_fn = make_gtcrn_train_step(mesh)
        state = init_fn(jax.random.PRNGKey(0))
        g = np.random.default_rng(1)
        clean = g.standard_normal((4, 4096)).astype(np.float32) * 0.1
        noisy = clean + g.standard_normal((4, 4096)).astype(np.float32) * 0.05
        state, loss = step_fn(state, noisy, clean)
        assert np.isfinite(float(loss))
        assert int(jax.device_get(state.step)) == 1


class TestCheckpoint:
    def test_orbax_roundtrip(self, mesh, tmp_path):
        from speech_diarization_tpu.train.checkpoint import (
            restore_train_state, save_train_state,
        )

        net = EcapaTdnn(n_mels=20, channels=64, emb_dim=32, scale=4,
                        se_channels=16, att_channels=16)
        init_fn, step_fn, shard_state = make_ecapa_train_step(mesh, net, n_classes=8)
        state = init_fn(jax.random.PRNGKey(0))
        save_train_state(tmp_path / "ckpt", state)
        template = init_fn(jax.random.PRNGKey(1))
        restored = restore_train_state(tmp_path / "ckpt", template)
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_npz_export(self, tmp_path):
        from speech_diarization_tpu.models.port import load_params_npz
        from speech_diarization_tpu.train.checkpoint import export_inference_weights

        params = {"a": {"w": jnp.ones((3, 3))}, "b": jnp.zeros((2,))}
        export_inference_weights(tmp_path / "w.npz", params)
        back = load_params_npz(tmp_path / "w.npz")
        assert set(back) == {"a/w", "b"}
