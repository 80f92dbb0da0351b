"""Native C++ audio runtime vs numpy/scipy oracles."""
import numpy as np
import pytest

from speech_diarization_tpu import native
from speech_diarization_tpu.dsp.resample import resample_host


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestDecode:
    def test_pcm16_stereo_monomix(self):
        g = np.random.default_rng(0)
        pcm = (g.standard_normal((1000, 2)) * 8000).astype("<i2")
        out = native.decode_pcm(pcm.tobytes(), channels=2, width=2)
        ref = (pcm.astype(np.float32) / 32768.0).mean(axis=1)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_pcm24(self):
        vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1], dtype=np.int32)
        raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
        out = native.decode_pcm(raw, channels=1, width=3)
        np.testing.assert_allclose(out, vals / float(1 << 23), atol=1e-6)


class TestResample:
    @pytest.mark.parametrize("orig,target", [(44100, 16000), (8000, 16000), (48000, 16000)])
    def test_matches_scipy(self, orig, target):
        g = np.random.default_rng(0)
        y = (g.standard_normal(orig) * 0.3).astype(np.float32)
        ref = resample_host(y, orig, target)
        out = native.resample_poly(y, orig, target)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-4)


class TestFraming:
    def test_matches_numpy(self):
        g = np.random.default_rng(1)
        y = g.standard_normal(5000).astype(np.float32)
        out = native.frame(y, 480, 160)
        from speech_diarization_tpu.dsp.framing import num_frames

        n = num_frames(5000, 480, 160)
        assert out.shape == (n, 480)
        np.testing.assert_array_equal(out[0], y[:480])
        np.testing.assert_array_equal(out[3][:480], y[480:960])

    def test_rms_prescan(self):
        y = np.concatenate([np.zeros(1600), 0.5 * np.ones(1600)]).astype(np.float32)
        db = native.frame_rms_db(y, 400, 160)
        assert db[0] < -90
        assert db[-3] > -8
