"""Quality-gate integration tests: trained neural VAD end-to-end DER, speaker
encoder learnability, JER metric."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.config import AudioConfig, ClusterConfig, DiarizationConfig
from speech_diarization_tpu.metrics import diarization_error_rate, jaccard_error_rate
from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
from speech_diarization_tpu.types import SegmentArray

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)

WEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "vad_synthetic.npz"


def _fake_encoder(wavs):
    w = np.asarray(wavs)
    spec = np.abs(np.fft.rfft(w, axis=1))
    bands = np.array_split(np.arange(spec.shape[1]), 16)
    feats = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
    return jnp.asarray(feats.astype(np.float32))


def synth_conv_speechlike(turns, sr=16000, gap_s=0.6, seed=0):
    """Conversation of synthetic speech-like turns (harmonic, modulated) —
    harder than pure tones, matches the VAD's training domain."""
    from speech_diarization_tpu.train.synthetic import make_speaker_bank, synth_speech_like

    g = np.random.default_rng(seed)
    bank = make_speaker_bank(np.random.default_rng(42), 4)
    parts, starts, ends, spks = [], [], [], []
    t0 = 0.0
    for spk, dur in turns:
        parts.append(np.zeros(int(gap_s * sr), np.float32))
        t0 += gap_s
        prof = bank[spk]
        sig = synth_speech_like(g, dur, sr, f0=prof["f0"], formants=prof["formants"])
        parts.append(sig + 0.003 * g.standard_normal(len(sig)).astype(np.float32))
        starts.append(t0)
        ends.append(t0 + len(sig) / sr)
        spks.append(spk)
        t0 += len(sig) / sr
    parts.append(np.zeros(int(gap_s * sr), np.float32))
    return np.concatenate(parts), SegmentArray(
        np.array(starts), np.array(ends), np.array(spks, dtype=np.int32))


class TestNeuralVadEndToEnd:
    def test_der_with_trained_vad(self):
        from functools import partial

        from speech_diarization_tpu.models.vad import VadModel
        from speech_diarization_tpu.train.recipes import load_vad_weights

        wave, truth = synth_conv_speechlike(
            [(0, 3.0), (1, 2.5), (0, 2.5), (1, 3.0)])
        model = VadModel()
        params = load_vad_weights(WEIGHTS)
        vad_fn = jax.jit(partial(model.probs, params))
        # speech-like signals share broadband structure, so the fake band
        # encoder's cross-speaker cosine sits ~0.92 (vs ~0.998 within) —
        # cut the AHC dendrogram between the two
        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc", cos_threshold=0.96),
        )
        pipe = DiarizationPipeline(cfg, encode_fn=_fake_encoder, vad_probs_fn=vad_fn)
        result = pipe((wave, 16000))
        assert result.num_speakers == 2
        der = diarization_error_rate(truth, result.segments, collar_s=0.25)
        assert der.der < 0.2, str(der)


class TestSpeakerTraining:
    def test_encoder_learns_synthetic_speakers(self):
        from speech_diarization_tpu.train.recipes import train_speaker_encoder_synthetic

        _, metrics = train_speaker_encoder_synthetic(
            steps=40, batch=8, n_speakers=4)
        assert metrics["loss"][-1] < metrics["loss"][0]
        assert metrics["probe_purity"] > 0.7


class TestClusterBackendQuality:
    """Every cluster backend must stay under 2% DER on the synthetic tone
    harness (VERDICT r1: hdbscan2 shipped at 37.8% because stage 1 EOM
    under-clustered; spectral at 7.6% because a fixed percentile cannot
    adapt to cluster sizes).  Mirrors scripts/eval_synthetic.py."""

    @pytest.mark.parametrize("method", ["spectral", "ahc", "hdbscan", "hdbscan2"])
    def test_der_under_2pct(self, method):
        from speech_diarization_tpu.train.synthetic import make_tone_conversation

        from speech_diarization_tpu.config import OverlapConfig

        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method=method, max_speakers=6),
            # tone harness + fake encoder: out-of-family for the default-on
            # overlap rescue (see tests/test_pipeline.make_pipeline) — this
            # test isolates the CLUSTER backends
            overlap=OverlapConfig(enabled=False),
        )
        pipe = DiarizationPipeline(cfg, encode_fn=_fake_encoder)
        ders = []
        for seed in range(3):
            wave, (starts, ends, spks) = make_tone_conversation(seed)
            truth = SegmentArray(starts, ends, spks)
            res = pipe((wave, 16000))
            ders.append(diarization_error_rate(truth, res.segments, collar_s=0.25).der)
        assert np.mean(ders) < 0.02, f"{method}: mean DER {np.mean(ders):.4f} ({ders})"


class TestJer:
    def test_perfect_is_zero(self):
        truth = SegmentArray(np.array([0.0, 5.0]), np.array([4.0, 9.0]),
                             np.array([0, 1]))
        assert jaccard_error_rate(truth, truth) < 1e-9

    def test_half_coverage(self):
        truth = SegmentArray(np.array([0.0]), np.array([10.0]), np.array([0]))
        hyp = SegmentArray(np.array([0.0]), np.array([5.0]), np.array([0]))
        jer = jaccard_error_rate(truth, hyp)
        assert abs(jer - 0.5) < 0.01

    def test_missing_speaker(self):
        truth = SegmentArray(np.array([0.0, 5.0]), np.array([4.0, 9.0]),
                             np.array([0, 1]))
        hyp = SegmentArray(np.array([0.0]), np.array([4.0]), np.array([0]))
        jer = jaccard_error_rate(truth, hyp)
        assert 0.45 < jer < 0.55  # one perfect, one fully missed


class TestEnhanceChain:
    """BASELINE config 3: GTCRN enhancement chained in front of VAD+embed on a
    noisy recording (the stage the reference left commented out,
    diarization_baseline.py:333-338)."""

    WEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "gtcrn_synthetic.npz"

    @pytest.mark.skipif(not WEIGHTS.exists(), reason="gtcrn weights not shipped")
    def test_enhancement_improves_noisy_diarization(self):
        from functools import partial

        from speech_diarization_tpu.config import EnhanceConfig
        from speech_diarization_tpu.models.vad import VadModel
        from speech_diarization_tpu.train.recipes import load_vad_weights
        from speech_diarization_tpu.train.synthetic import make_conversation

        g = np.random.default_rng(77)
        wave, (s, e, k) = make_conversation(g, 30.0, n_speakers=2)
        # HEAVY noise: the regime the enhancement stage exists for. At this
        # level the plain chain collapses (measured 100% DER: the VAD drowns)
        # while the enhanced chain stays usable (~11%). At LIGHT noise
        # enhancement artifacts actually cost a few DER points — the likely
        # reason the reference shipped this stage commented out
        # (diarization_baseline.py:333-338); it is a switch, not a default.
        noisy = (wave + 0.2 * g.standard_normal(len(wave))).astype(np.float32)
        truth = SegmentArray(s, e, k)

        vad = VadModel()
        vad_fn = jax.jit(partial(
            vad.probs,
            load_vad_weights(Path(__file__).resolve().parents[1]
                             / "weights" / "vad_synthetic.npz")))
        base = dict(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc", max_speakers=4),
        )
        # enhancement is noise-adaptive BY DEFAULT now (EnhanceConfig
        # scope='auto'), so the un-enhanced contrast chain must opt out
        # explicitly — without this both pipelines engage denoise-for-VAD
        # at this SNR and measure identically
        plain = DiarizationPipeline(
            DiarizationConfig(**base, enhance=EnhanceConfig(enabled=False)),
            vad_probs_fn=vad_fn)
        enhanced = DiarizationPipeline(
            DiarizationConfig(**base, enhance=EnhanceConfig(enabled=True)),
            vad_probs_fn=vad_fn)

        der_plain = diarization_error_rate(
            truth, plain((noisy, 16000)).segments, collar_s=0.25).der
        der_enh = diarization_error_rate(
            truth, enhanced((noisy, 16000)).segments, collar_s=0.25).der
        # at heavy noise the enhanced chain must massively beat the plain one
        # (plain measured 88-100% DER; enhanced 11-36% across noise draws)
        assert der_enh < der_plain - 0.30, (der_plain, der_enh)
        assert der_enh < 0.45, der_enh

        # scope='vad': denoised audio only gates the VAD, embeddings stay on
        # the raw signal — must also rescue the drowned plain chain
        vad_scoped = DiarizationPipeline(
            DiarizationConfig(**base,
                              enhance=EnhanceConfig(enabled=True, scope="vad")),
            vad_probs_fn=vad_fn)
        der_scoped = diarization_error_rate(
            truth, vad_scoped((noisy, 16000)).segments, collar_s=0.25).der
        assert der_scoped < der_plain - 0.30, (der_plain, der_scoped)
