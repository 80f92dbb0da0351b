"""Enhancement pipeline tests: OLA reconstruction fidelity, window contracts,
ZipEnhancer-class model shapes."""
import numpy as np
import pytest
from pathlib import Path

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models.gtcrn import gtcrn_init_params
from speech_diarization_tpu.pipelines.enhance import (
    GtcrnEnhancer,
    make_enhance_fn,
    windowed_enhance,
)

SR = 16000


def _sig(n, seed=0):
    x = 0.3 * np.random.default_rng(seed).standard_normal(n)
    return np.clip(x, -0.95, 0.95).astype(np.float32)  # stay under the peak limiter


class TestWindowedEnhance:
    def test_identity_model_reconstructs(self):
        """With an identity 'denoiser', windowed OLA must reproduce the input
        (up to the normalized sqrt-Hann partition of unity)."""
        y = _sig(5 * SR)
        out = windowed_enhance(lambda b: b, y, SR, window_s=2.0, hop_ratio=0.75,
                               batch_size=8)
        assert out.shape == y.shape
        # first/last sample sit at the window's zero crossing — excluded
        np.testing.assert_allclose(out[1:-1], y[1:-1], atol=1e-4)

    def test_short_input_single_window(self):
        y = _sig(SR)  # shorter than one 2s window
        out = windowed_enhance(lambda b: b, y, SR)
        assert out.shape == y.shape
        np.testing.assert_allclose(out[1:-1], y[1:-1], atol=1e-4)

    def test_peak_limiting(self):
        y = _sig(3 * SR)
        out = windowed_enhance(lambda b: b * 10.0, y, SR)
        assert np.abs(out).max() <= 0.995

    def test_gain_model_scales(self):
        y = _sig(4 * SR)
        out = windowed_enhance(lambda b: b * 0.5, y, SR)
        np.testing.assert_allclose(out[1:-1], 0.5 * y[1:-1], atol=1e-4)


@pytest.mark.slow
class TestGtcrnEnhancer:
    @pytest.fixture(scope="class")
    def enhancer(self):
        params = gtcrn_init_params(jax.random.PRNGKey(0))
        return GtcrnEnhancer(params, chunk_s=4.0, overlap_s=1.0, batch_chunks=2)

    def test_short_path_shape(self, enhancer):
        y = _sig(2 * SR)
        out = enhancer(y)
        assert out.shape == y.shape
        assert np.isfinite(out).all()

    def test_chunked_path_matches_short_path_inside(self, enhancer):
        """Chunked OLA must agree with the single-shot forward away from
        chunk boundaries (the causal/consistency property of the reference's
        streaming, gtcrn_wrap.py:101-153)."""
        y = _sig(10 * SR)  # forces 4s chunking
        out_chunked = enhancer(y)
        single = GtcrnEnhancer(enhancer.params, chunk_s=12.0, overlap_s=1.0)
        out_single = single(y)
        assert out_chunked.shape == out_single.shape
        # compare in the interior of the first chunk (no boundary effects)
        a, b = SR, 2 * SR
        err = np.abs(out_chunked[a:b] - out_single[a:b]).max()
        scale = np.abs(out_single[a:b]).max() + 1e-6
        assert err / scale < 0.05

    def test_factory(self):
        fn = make_enhance_fn("gtcrn", chunk_s=4.0)
        y = _sig(SR)
        out = np.asarray(fn(jnp.asarray(y)))
        assert out.shape == y.shape


@pytest.mark.slow
class TestZipEnhancerModel:
    def test_forward_shapes(self):
        from speech_diarization_tpu.models.zipenhancer import ZipEnhancerModel

        model = ZipEnhancerModel(channels=16, blocks=1, heads=2)
        params = model.init(jax.random.PRNGKey(0))
        wavs = jnp.asarray(_sig(2 * SR)[None].repeat(2, axis=0))
        out = np.asarray(jax.jit(model.apply)(params, wavs))
        assert out.shape == (2, 2 * SR)
        assert np.isfinite(out).all()


class TestTrainedEnhancement:
    """VERDICT r1 #4: enhancement must demonstrably improve SI-SNR."""

    WEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "gtcrn_synthetic.npz"

    @pytest.mark.skipif(not WEIGHTS.exists(), reason="gtcrn_synthetic.npz not shipped")
    def test_shipped_gtcrn_improves_si_snr(self):
        import jax

        from speech_diarization_tpu.models.gtcrn import GTCRN
        from speech_diarization_tpu.models.port import load_params_npz
        from speech_diarization_tpu.dsp.stft import istft_ri, stft_ri
        from speech_diarization_tpu.train.recipes import (
            make_noisy_clean_batch, si_snr_db,
        )

        params = load_params_npz(self.WEIGHTS)
        net = GTCRN()

        @jax.jit
        def enhance(noisy):
            spec = stft_ri(noisy, 512, 256)
            return istft_ri(net.apply(params, spec), 512, 256,
                            length=noisy.shape[-1])

        g = np.random.default_rng(123)  # fresh seed, not the training stream
        noisy, clean = make_noisy_clean_batch(g, 8, 2.0)
        enh = np.asarray(enhance(jnp.asarray(noisy)))
        gain = si_snr_db(enh, clean) - si_snr_db(noisy, clean)
        assert gain >= 3.0, f"SI-SNR gain only {gain:.2f} dB"

    @staticmethod
    def _propagate_sdtpu(monkeypatch):
        # the package logger sets propagate=False; caplog hangs off the root
        import logging

        monkeypatch.setattr(logging.getLogger("sdtpu"), "propagate", True)

    @pytest.mark.skipif(not WEIGHTS.exists(), reason="gtcrn_synthetic.npz not shipped")
    def test_make_enhance_fn_defaults_to_shipped_weights(self, caplog, monkeypatch):
        import logging

        from speech_diarization_tpu.pipelines.enhance import make_enhance_fn

        self._propagate_sdtpu(monkeypatch)
        with caplog.at_level(logging.INFO, logger="sdtpu.enhance"):
            make_enhance_fn("gtcrn")
        assert any("using shipped trained weights" in r.message
                   for r in caplog.records)

    def test_random_weight_warning_is_loud(self, caplog, tmp_path, monkeypatch):
        import logging

        from speech_diarization_tpu.pipelines import enhance as enh_mod
        from speech_diarization_tpu.utils import weights as weights_mod

        # point the shared weights root somewhere empty
        monkeypatch.setattr(weights_mod, "WEIGHTS_ROOT", tmp_path / "none")
        self._propagate_sdtpu(monkeypatch)
        with caplog.at_level(logging.WARNING, logger="sdtpu.enhance"):
            enh_mod.make_enhance_fn("gtcrn")
        assert any("RANDOM" in r.message for r in caplog.records)


class TestTrainedZipEnhancer:
    ZWEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "zipenhancer_synthetic.npz"

    @pytest.mark.skipif(not ZWEIGHTS.exists(), reason="zipenhancer weights not shipped")
    def test_shipped_zipenhancer_improves_si_snr(self):
        from speech_diarization_tpu.models.port import load_params_npz
        from speech_diarization_tpu.models.zipenhancer import ZipEnhancerModel
        from speech_diarization_tpu.train.recipes import (
            make_noisy_clean_batch, si_snr_db,
        )

        model = ZipEnhancerModel()
        params = load_params_npz(self.ZWEIGHTS)
        fwd = jax.jit(lambda y: model.apply(params, y))
        g = np.random.default_rng(321)
        noisy, clean = make_noisy_clean_batch(g, 6, 2.0)
        enh = np.asarray(fwd(jnp.asarray(noisy)))
        gain = si_snr_db(enh, clean) - si_snr_db(noisy, clean)
        assert gain >= 3.0, f"SI-SNR gain only {gain:.2f} dB"


class TestAutoScope:
    """EnhanceConfig.scope='auto': noise-floor probe gates the denoiser."""

    def _make_pipe(self, **enh_kwargs):
        from speech_diarization_tpu.config import (
            DiarizationConfig, EnhanceConfig,
        )
        from speech_diarization_tpu.pipelines.diarize import (
            DiarizationPipeline,
        )

        cfg = DiarizationConfig(enhance=EnhanceConfig(**enh_kwargs))
        return DiarizationPipeline(cfg)

    def _speech_like(self, noise_rms: float, dur_s: float = 8.0,
                     sr: int = 16000) -> np.ndarray:
        """Sine bursts (speech stand-in) over a constant noise floor."""
        g = np.random.default_rng(0)
        t = np.arange(int(dur_s * sr)) / sr
        y = g.standard_normal(len(t)).astype(np.float32) * noise_rms
        for k in range(int(dur_s) // 2):
            a, b = int((2 * k + 0.3) * sr), int((2 * k + 1.5) * sr)
            y[a:b] += (0.3 * np.sin(2 * np.pi * 220 * t[a:b])).astype(np.float32)
        return y

    def test_snr_estimate_separates_clean_from_noisy(self):
        pipe = self._make_pipe(enabled=False)
        sr = 16000
        clean = self._speech_like(noise_rms=1e-4)
        noisy = self._speech_like(noise_rms=0.05)  # ~10 dB vs 0.3-peak bursts
        yc = jnp.asarray(np.pad(clean, (0, 60 * sr - len(clean))))
        yn = jnp.asarray(np.pad(noisy, (0, 60 * sr - len(noisy))))
        snr_clean = pipe._estimate_snr_db(yc, len(clean))
        snr_noisy = pipe._estimate_snr_db(yn, len(noisy))
        assert snr_clean > 30.0, snr_clean
        assert snr_noisy < 18.0, snr_noisy
        # padding zeros must not contaminate the floor estimate
        assert snr_noisy > 3.0, snr_noisy

    def test_empty_input_returns_inf(self):
        pipe = self._make_pipe(enabled=False)
        y = jnp.zeros(16000, jnp.float32)
        assert pipe._estimate_snr_db(y, 16000) == float("inf")

    @pytest.mark.slow
    def test_auto_engages_only_on_noisy_audio(self):
        sr = 16000
        pipe = self._make_pipe(enabled=True, backend="gtcrn", scope="auto")
        clean = self._speech_like(noise_rms=1e-4)
        wave, vad_wave, _ = pipe._load_waves((clean, sr))
        np.testing.assert_array_equal(np.asarray(wave), np.asarray(vad_wave))

        noisy = self._speech_like(noise_rms=0.05)
        wave, vad_wave, _ = pipe._load_waves((noisy, sr))
        assert not np.allclose(np.asarray(wave), np.asarray(vad_wave))

    @pytest.mark.slow
    def test_probe_separates_synthesis_domains(self):
        """The p95/p05 statistic must keep clean/reverb domains above the
        auto threshold and noise domains below it (the measured separation
        the 25 dB default rests on); a generator or probe change that
        collapses the gap should fail here, not in production."""
        from speech_diarization_tpu.train.heldout import (
            make_conversation_heldout,
        )
        from speech_diarization_tpu.train.synthetic import make_conversation

        pipe = self._make_pipe(enabled=False)
        sr, dur = 16000, 60.0
        thr = 25.0

        def snr(y):
            t = len(y)
            pad = max(60 * sr, -(-t // (60 * sr)) * 60 * sr)
            yd = jnp.asarray(np.pad(np.asarray(y, np.float32), (0, pad - t)))
            return pipe._estimate_snr_db(yd, t)

        g = lambda s: np.random.default_rng(s)
        clean = [
            make_conversation(g(11), dur, n_speakers=3)[0],
            make_conversation_heldout(g(12), dur, n_speakers=3)[0],
            make_conversation_heldout(g(13), dur, n_speakers=3, rt60_s=0.6)[0],
        ]
        noisy = [
            make_conversation_heldout(g(14), dur, n_speakers=3,
                                      snr_db=10.0, noise_kind="white")[0],
            make_conversation_heldout(g(15), dur, n_speakers=3,
                                      snr_db=15.0, noise_kind="babble")[0],
            make_conversation_heldout(g(16), dur, n_speakers=3,
                                      snr_db=5.0, noise_kind="babble")[0],
        ]
        for y in clean:
            assert snr(y) > thr + 5.0
        for y in noisy:
            assert snr(y) < thr - 5.0


@pytest.mark.slow
def test_demix_dialog_frontend_shape():
    """The separation front-end (EnhanceConfig.backend='demix-dialog') must
    return a same-length 16 kHz mono waveform — measured to rescue babble@5
    (DER 26.8% -> 14.6%, scripts/exp_babble_frontend.py 2026-08-19)."""
    from speech_diarization_tpu.pipelines.enhance import make_enhance_fn

    fe = make_enhance_fn("demix-dialog")
    y = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    out = np.asarray(fe(y))
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))
