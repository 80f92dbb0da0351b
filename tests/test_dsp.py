"""Unit tests for the DSP layer against scipy/numpy oracles (SURVEY.md §4)."""
import numpy as np
import pytest
import scipy.signal as sps

import jax
import jax.numpy as jnp

from speech_diarization_tpu import dsp
from speech_diarization_tpu.dsp.loudness import k_weighting_coeffs, k_weight


SR = 16000


def _sig(n=SR, seed=0):
    g = np.random.default_rng(seed)
    return g.standard_normal(n).astype(np.float32) * 0.2


# ---------------------------------------------------------------- framing ----
class TestFraming:
    def test_shapes_and_values(self):
        y = np.arange(100, dtype=np.float32)
        fr = np.asarray(dsp.frame_signal(jnp.asarray(y), win=30, hop=10))
        # covers the tail by zero-padding (diar_diag.py:48-56 behavior)
        assert fr.shape == (dsp.num_frames(100, 30, 10), 30)
        np.testing.assert_array_equal(fr[0], y[:30])
        np.testing.assert_array_equal(fr[1], y[10:40])

    def test_tail_padding(self):
        y = np.arange(95, dtype=np.float32)
        fr = np.asarray(dsp.frame_signal(jnp.asarray(y), 30, 10))
        last = fr[-1]
        start = 10 * (fr.shape[0] - 1)
        valid = 95 - start
        np.testing.assert_array_equal(last[:valid], y[start:])
        assert np.all(last[valid:] == 0)

    def test_no_pad_matches_strided(self):
        y = _sig(1000)
        fr = np.asarray(dsp.frame_signal(jnp.asarray(y), 64, 16, pad_tail=False))
        n = 1 + (1000 - 64) // 16
        assert fr.shape == (n, 64)
        for i in [0, 5, n - 1]:
            np.testing.assert_array_equal(fr[i], y[i * 16 : i * 16 + 64])

    def test_batched(self):
        y = np.stack([_sig(500, 1), _sig(500, 2)])
        fr = np.asarray(dsp.frame_signal(jnp.asarray(y), 100, 50))
        assert fr.shape[0] == 2
        np.testing.assert_array_equal(fr[1][0], y[1][:100])


# ------------------------------------------------------------------- stft ----
class TestStft:
    def test_roundtrip(self):
        y = _sig(SR)
        spec = dsp.stft(jnp.asarray(y), 512, 256)
        out = np.asarray(dsp.istft(spec, 512, 256, length=SR))
        np.testing.assert_allclose(out, y, atol=1e-4)

    def test_matmul_dft_matches_fft(self):
        y = _sig(4096)
        s1 = np.asarray(dsp.stft(jnp.asarray(y), 512, 256, matmul=False))
        s2 = np.asarray(dsp.stft(jnp.asarray(y), 512, 256, matmul=True))
        np.testing.assert_allclose(s1, s2, atol=2e-3)

    def test_against_scipy(self):
        y = _sig(4096)
        w = np.asarray(dsp.sqrt_hann_window(512))
        spec = np.asarray(dsp.stft(jnp.asarray(y), 512, 256, center=False))
        # scipy ShortTimeFFT-free oracle: manual frames + rfft
        n = 1 + (4096 - 512) // 256
        ref = np.stack(
            [np.fft.rfft(y[i * 256 : i * 256 + 512] * w) for i in range(n)], axis=1
        )
        np.testing.assert_allclose(spec, ref, atol=1e-3)

    def test_batch_shape(self):
        y = jnp.zeros((3, SR))
        spec = dsp.stft(y, 512, 256)
        assert spec.shape == (3, 257, SR // 256 + 1)


# -------------------------------------------------------------------- ola ----
class TestOla:
    def test_scatter_vs_reshape_paths(self):
        g = np.random.default_rng(3)
        frames = g.standard_normal((7, 128)).astype(np.float32)
        # hop divides win -> reshape path
        y1 = np.asarray(dsp.overlap_add(jnp.asarray(frames), 32))
        # generic scatter path oracle
        t = 6 * 32 + 128
        ref = np.zeros(t, np.float32)
        for i in range(7):
            ref[i * 32 : i * 32 + 128] += frames[i]
        np.testing.assert_allclose(y1, ref, atol=1e-5)
        # hop NOT dividing win -> scatter path
        y2 = np.asarray(dsp.overlap_add(jnp.asarray(frames), 48))
        ref2 = np.zeros(6 * 48 + 128, np.float32)
        for i in range(7):
            ref2[i * 48 : i * 48 + 128] += frames[i]
        np.testing.assert_allclose(y2, ref2, atol=1e-5)

    def test_normalization_weights(self):
        den = np.asarray(dsp.ola_normalization(10, 128, 64))
        assert den.shape == (9 * 64 + 128,)
        assert np.isclose(den[200], 2.0)  # interior covered by exactly 2 frames


# -------------------------------------------------------------------- mel ----
class TestMel:
    def test_filterbank_partition(self):
        fb = np.asarray(dsp.mel_filterbank(201, 20.0, 7900.0, 80, SR))
        assert fb.shape == (201, 80)
        assert fb.min() >= 0
        # interior frequencies are covered (triangles tile the band)
        interior = fb[5:195].sum(axis=1)
        assert (interior > 0).mean() > 0.95

    def test_fbank_shapes_and_norm(self):
        wavs = jnp.asarray(np.stack([_sig(SR, 1), _sig(SR, 2)]))
        feat = np.asarray(dsp.fbank_batch(wavs))
        assert feat.shape == (2, SR // 160 + 1, 80)
        np.testing.assert_allclose(feat.mean(axis=1), 0.0, atol=1e-4)

    def test_tone_peaks_at_right_mel(self):
        t = np.arange(SR) / SR
        tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        feat = np.asarray(dsp.fbank_batch(jnp.asarray(tone[None]), mean_norm=False))[0]
        mean_spec = feat.mean(axis=0)
        peak_mel = mean_spec.argmax()
        # 1 kHz in HTK mel ≈ 1000 mel; band centers span 20Hz..7900Hz over 80 bands
        # -> peak should sit in the middle third
        assert 25 <= peak_mel <= 50


# --------------------------------------------------------------- resample ----
class TestResample:
    @pytest.mark.parametrize("orig,target", [(44100, 16000), (8000, 16000), (48000, 16000)])
    def test_matches_scipy(self, orig, target):
        g = np.random.default_rng(0)
        y = g.standard_normal(orig).astype(np.float32) * 0.3
        ref = dsp.resample_host(y, orig, target)
        out = np.asarray(dsp.resample_poly_jax(jnp.asarray(y), orig, target))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-4)

    def test_identity(self):
        y = _sig(1000)
        out = np.asarray(dsp.resample_poly_jax(jnp.asarray(y), SR, SR))
        np.testing.assert_array_equal(out, y)

    def test_preserves_tone_frequency(self):
        t = np.arange(44100 * 2) / 44100
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = np.asarray(dsp.resample_poly_jax(jnp.asarray(tone), 44100, 16000))
        spec = np.abs(np.fft.rfft(out[1000:17000] * np.hanning(16000)))
        freq = np.fft.rfftfreq(16000, 1 / 16000)[spec.argmax()]
        assert abs(freq - 440) < 2


# --------------------------------------------------------------- loudness ----
@pytest.mark.slow
class TestLoudness:
    def test_k_weight_matches_scipy_lfilter(self):
        y = _sig(SR * 2)
        ref = y.astype(np.float64)
        for b, a in k_weighting_coeffs(SR):
            ref = sps.lfilter(b, a, ref)
        # scan mode: exact recurrence in f32 — the marginally-stable RLB pole
        # accumulates ~3e-3 absolute on 0.3-amplitude noise (~0.04 dB loudness)
        out = np.asarray(k_weight(jnp.asarray(y), SR, mode="scan"))
        np.testing.assert_allclose(out, ref, atol=6e-3)
        lufs_err = 10 * abs(np.log10(np.mean(out**2) / np.mean(ref**2)))
        assert lufs_err < 0.05
        # fir mode: truncated impulse response, tighter samplewise
        out_fir = np.asarray(k_weight(jnp.asarray(y), SR, mode="fir"))
        np.testing.assert_allclose(out_fir, ref, atol=1e-3)

    def test_sine_loudness_sanity(self):
        # 997 Hz full-scale sine: BS.1770 says ≈ -3.01 LUFS at unity gain
        t = np.arange(SR * 5) / SR
        y = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
        lufs = float(dsp.integrated_loudness(jnp.asarray(y), SR))
        assert abs(lufs - (-3.01)) < 0.3

    def test_normalize_hits_target(self):
        t = np.arange(SR * 5) / SR
        y = (0.05 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        out = dsp.loudness_normalize(jnp.asarray(y), SR, target_lufs=-18.0)
        lufs = float(dsp.integrated_loudness(out, SR))
        assert abs(lufs - (-18.0)) < 0.5

    def test_silence_passthrough(self):
        y = np.zeros(SR, np.float32)
        out = np.asarray(dsp.loudness_normalize(jnp.asarray(y), SR))
        np.testing.assert_array_equal(out, y)


# ------------------------------------------------------------- preprocess ----
class TestPreprocess:
    def test_preemphasis(self):
        y = _sig(1000)
        out = np.asarray(dsp.preemphasis(jnp.asarray(y), 0.97))
        np.testing.assert_allclose(out[1:], y[1:] - 0.97 * y[:-1], atol=1e-6)

    def test_remove_dc(self):
        y = _sig(1000) + 0.5
        out = np.asarray(dsp.remove_dc(jnp.asarray(y)))
        assert abs(out.mean()) < 1e-5

    def test_jit_composes(self):
        f = jax.jit(lambda x: dsp.preprocess_waveform(x))
        y = _sig(1600)
        out = np.asarray(f(jnp.asarray(y)))
        assert out.shape == y.shape


@pytest.mark.slow
class TestIirChunked:
    """sos_scan_chunked must equal the monolithic scan and scipy exactly:
    the chunk boundary state carry is exact, not an approximation."""

    def test_matches_scipy_and_monolithic(self):
        from scipy import signal as sps

        from speech_diarization_tpu.dsp.iir import sos_scan, sos_scan_chunked
        from speech_diarization_tpu.dsp.loudness import k_weighting_coeffs

        g = np.random.default_rng(0)
        x = g.standard_normal(50_000).astype(np.float32)
        sections = k_weighting_coeffs(16000.0)

        ref = x.astype(np.float64)
        for b, a in sections:
            ref = sps.lfilter(b, a, ref)

        mono = np.asarray(sos_scan(jnp.asarray(x), sections))
        chunked = np.asarray(sos_scan_chunked(jnp.asarray(x), sections, chunk=4096))
        # f32 IIR with the RLB high-pass's near-unit-circle pole accumulates
        # ~1% waveform error over 50k samples (chunked and monolithic alike;
        # both are exact to 2e-11 in f64).  1% amplitude = 0.09 dB -- far
        # below loudness-gating resolution.
        np.testing.assert_allclose(mono, ref, atol=0.05)
        np.testing.assert_allclose(chunked, ref, atol=0.05)
        np.testing.assert_allclose(chunked, mono, atol=0.05)
        # energy-level agreement (what loudness actually consumes): <0.01 dB
        db = lambda v: 10 * np.log10(np.mean(v ** 2))
        assert abs(db(chunked) - db(ref)) < 0.01
        assert abs(db(mono) - db(ref)) < 0.01

    def test_chunk_boundary_continuity(self):
        """No discontinuity artifacts at chunk edges (uneven tail chunk)."""
        from speech_diarization_tpu.dsp.iir import sos_scan, sos_scan_chunked
        from speech_diarization_tpu.dsp.loudness import k_weighting_coeffs

        g = np.random.default_rng(1)
        x = g.standard_normal(10_000 + 123).astype(np.float32)
        sections = k_weighting_coeffs(16000.0)
        a = np.asarray(sos_scan(jnp.asarray(x), sections))
        b = np.asarray(sos_scan_chunked(jnp.asarray(x), sections, chunk=1000))
        np.testing.assert_allclose(a, b, atol=0.05)  # f32 noise, see above
        # exactness of the state carry is asserted in f64
        import jax as _jax
        try:
            _jax.config.update("jax_enable_x64", True)
            x64 = x.astype(np.float64)
            a64 = np.asarray(sos_scan(jnp.asarray(x64), sections))
            b64 = np.asarray(sos_scan_chunked(jnp.asarray(x64), sections, chunk=1000))
            np.testing.assert_allclose(a64, b64, atol=1e-9)
        finally:
            _jax.config.update("jax_enable_x64", False)

    def test_overlap_matches_sequential(self):
        """The parallel overlap-warmup variant must match the exact
        sequential-state scan: warmup >= 8192 makes the discarded initial
        state invisible for the K-weighting pole radii."""
        from speech_diarization_tpu.dsp.iir import sos_scan, sos_scan_overlap
        from speech_diarization_tpu.dsp.loudness import k_weighting_coeffs

        g = np.random.default_rng(2)
        x = g.standard_normal(100_000 + 777).astype(np.float32)
        sections = k_weighting_coeffs(16000.0)
        a = np.asarray(sos_scan(jnp.asarray(x), sections))
        b = np.asarray(
            sos_scan_overlap(jnp.asarray(x), sections, chunk=16384, warmup=8192))
        np.testing.assert_allclose(a, b, atol=0.05)  # f32 drift, see above
        import jax as _jax
        try:
            _jax.config.update("jax_enable_x64", True)
            x64 = x.astype(np.float64)
            a64 = np.asarray(sos_scan(jnp.asarray(x64), sections))
            b64 = np.asarray(sos_scan_overlap(
                jnp.asarray(x64), sections, chunk=16384, warmup=8192))
            # warmup truncation error ~r^8192 — below f64 noise
            np.testing.assert_allclose(a64, b64, atol=1e-9)
        finally:
            _jax.config.update("jax_enable_x64", False)

    def test_loudness_long_input_uses_chunked_path(self):
        """integrated_loudness on a long signal stays finite and matches the
        short-signal meter on a repeated excerpt."""
        from speech_diarization_tpu.dsp.loudness import integrated_loudness

        g = np.random.default_rng(2)
        y = (0.1 * g.standard_normal(16000 * 40)).astype(np.float32)
        l40 = float(integrated_loudness(jnp.asarray(y), 16000))
        assert np.isfinite(l40) and -40 < l40 < 0


class TestFbankBf16Backend:
    def test_matmul_bf16_close_to_f32(self):
        """bf16-operand DFT (the streaming trunk's fbank hot path) tracks
        the f32 matmul-DFT log-mel: tight in the mean, loose at the max
        (near-zero-power bins amplify bf16 rounding through the log; the
        embedding-level effect measured min-cos 0.999999 on chip shapes)."""
        from speech_diarization_tpu.dsp.mel import log_mel_spectrogram

        y = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 32000)).astype(np.float32) * 0.3)
        a = np.asarray(log_mel_spectrogram(y))
        b = np.asarray(log_mel_spectrogram(y, backend="matmul-bf16"))
        assert float(np.abs(a - b).mean()) < 0.01
        assert float(np.abs(a - b).max()) < 1.0

    def test_blocked_1d_fast_path_matches_batched(self):
        """The B==1 blocked-DFT fast path (no [1, T] degenerate-layout
        tensors — see the xplane-profile note in dsp/mel.py) must match
        the batched frame+einsum path to f32 summation-order tolerance."""
        from speech_diarization_tpu.dsp.mel import log_mel_spectrogram

        y = jnp.asarray(np.random.default_rng(1)
                        .standard_normal(48000).astype(np.float32) * 0.3)
        a = np.asarray(log_mel_spectrogram(y[None]))[0]      # fast path
        b = np.asarray(log_mel_spectrogram(jnp.stack([y, y])))[0]
        n = min(a.shape[0], b.shape[0])
        np.testing.assert_allclose(a[:n], b[:n], atol=1e-3)
