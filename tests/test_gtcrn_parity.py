"""Golden numeric parity: our JAX GTCRN vs the reference torch implementation.

Imports the reference net from /root/reference (read-only) purely as a test
oracle, random-initializes it, ports its state_dict through
``models/port.py``, and diffs outputs — the per-layer golden test strategy of
SURVEY.md §7.4 item 1.  Also carries forward the reference's causality
property test (``gtcrn.py:331-345``).
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def torch_gtcrn():
    from gtcrn import GTCRN as TorchGTCRN  # reference implementation (oracle)

    torch.manual_seed(0)
    model = TorchGTCRN().eval()
    return model


@pytest.fixture(scope="module")
def jax_gtcrn(torch_gtcrn):
    from speech_diarization_tpu.models.gtcrn import GTCRN
    from speech_diarization_tpu.models.port import port_torch_state_dict

    params = port_torch_state_dict(torch_gtcrn.state_dict())
    return GTCRN(), params


class TestGtcrnParity:
    def test_param_key_sets_match(self, torch_gtcrn):
        """Our init produces exactly the torch state_dict schema."""
        import jax
        from speech_diarization_tpu.models.gtcrn import gtcrn_init_params

        ours = gtcrn_init_params(jax.random.PRNGKey(0))
        theirs = {
            k: tuple(v.shape)
            for k, v in torch_gtcrn.state_dict().items()
            if not k.endswith("num_batches_tracked")
        }
        assert set(ours) == set(theirs)
        for k in theirs:
            assert tuple(ours[k].shape) == theirs[k], k

    def test_full_forward_parity(self, torch_gtcrn, jax_gtcrn):
        net, params = jax_gtcrn
        g = np.random.default_rng(0)
        spec = g.standard_normal((2, 257, 63, 2)).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = torch_gtcrn(torch.from_numpy(spec)).numpy()
        out = np.asarray(net.apply(params, jnp.asarray(spec)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_causality(self, jax_gtcrn):
        """Outputs on a shared prefix must agree; divergence only after the
        prefix (the reference's own smoke test, gtcrn.py:331-345)."""
        from speech_diarization_tpu.dsp import stft, istft, sqrt_hann_window
        from speech_diarization_tpu.dsp.stft import spec_as_real, real_as_spec

        net, params = jax_gtcrn
        g = np.random.default_rng(1)
        a = g.standard_normal(16000).astype(np.float32)
        b = g.standard_normal(16000).astype(np.float32)
        c = g.standard_normal(16000).astype(np.float32)
        x1 = np.concatenate([a, b])
        x2 = np.concatenate([a, c])

        def run(x):
            spec = stft(jnp.asarray(x), 512, 256)
            si = spec_as_real(spec)[None]
            so = net.apply(params, si)[0]
            return np.asarray(istft(real_as_spec(so), 512, 256, length=len(x)))

        y1, y2 = run(x1), run(x2)
        shared = 16000 - 2 * 256
        assert np.abs(y1[:shared] - y2[:shared]).max() < 1e-5
        assert np.abs(y1[16000 + 512:] - y2[16000 + 512:]).max() > 1e-3
