"""Tests for wider components: alternative embedders, demixer, baseline and
diagnostic pipelines, batch enhancement with resume."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.types import SegmentArray


def _fake_encoder(wavs):
    w = np.asarray(wavs)
    spec = np.abs(np.fft.rfft(w, axis=1))
    bands = np.array_split(np.arange(spec.shape[1]), 16)
    feats = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
    return jnp.asarray(feats.astype(np.float32))


@pytest.mark.slow
class TestAltEmbedders:
    def test_eres2netv2_shapes(self):
        from speech_diarization_tpu.models.eres2netv2 import ERes2NetV2, ERes2NetV2Model

        net = ERes2NetV2(n_mels=40, m_channels=8, base_width=16, scale=2,
                         expansion=2, num_blocks=(1, 1, 1, 1), emb_dim=32)
        model = ERes2NetV2Model(net)
        params = model.init(jax.random.PRNGKey(0))
        wavs = jnp.asarray(np.random.default_rng(0)
                           .standard_normal((2, 16000)).astype(np.float32))
        emb = np.asarray(model.encode_batch(params, wavs))
        assert emb.shape == (2, 32)
        assert np.isfinite(emb).all()

    def test_campp_shapes(self):
        from speech_diarization_tpu.models.campp import CamPlusPlus, CamPlusPlusModel

        net = CamPlusPlus(n_mels=40, m_channels=8, init_channels=32,
                          growth=16, bn_channels=32, num_layers=(2, 2),
                          dilations=(1, 2), kernels=(3, 3), emb_dim=32)
        model = CamPlusPlusModel(net)
        params = model.init(jax.random.PRNGKey(0))
        wavs = jnp.asarray(np.random.default_rng(1)
                           .standard_normal((2, 16000)).astype(np.float32))
        emb = np.asarray(model.encode_batch(params, wavs))
        assert emb.shape == (2, 32)
        assert np.isfinite(emb).all()

    def test_registry(self):
        from speech_diarization_tpu.models.registry import make_encoder

        fn, dim = make_encoder("ecapa", jit=False)
        # the registry resolves the PREFERRED shipped checkpoint, whose
        # embedding width is a training choice (the robust mixed-family
        # encoder ships 128-d; the SpeechBrain-parity default is 192-d) —
        # the contract is that the reported dim matches the model, not any
        # particular number
        emb = np.asarray(fn(jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 16000))
            .astype(np.float32))))
        assert emb.shape == (2, dim)
        assert np.isfinite(emb).all()
        with pytest.raises(ValueError):
            make_encoder("nope")


@pytest.mark.slow
class TestDemix:
    def test_separator_shapes(self):
        from speech_diarization_tpu.models.demix import DialogDemixer

        model = DialogDemixer(channels=8, depth=3, bottleneck_blocks=1)
        params = model.init(jax.random.PRNGKey(0))
        mix = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((1, 2, 44100)).astype(np.float32) * 0.1)
        out = np.asarray(jax.jit(model.apply)(params, mix))
        assert out.shape == (1, 3, 2, 44100)
        assert np.isfinite(out).all()

    def test_ensemble_chunked(self, tmp_path):
        from speech_diarization_tpu.models.demix import DialogDemixer
        from speech_diarization_tpu.pipelines.demix import EnsembleDemixer

        model = DialogDemixer(channels=8, depth=3, bottleneck_blocks=1)
        demixer = EnsembleDemixer(model=model, n_models=2, chunk_s=1.0, overlap=0.25)
        wav = (np.random.default_rng(0).standard_normal((2, 3 * 44100)) * 0.1
               ).astype(np.float32)
        stems = demixer.separate(wav, 44100)
        assert stems.shape == (3, 2, wav.shape[-1])
        assert np.isfinite(stems).all()

    def test_shift_averaging_matches_single_on_shift_invariant_input(self):
        """shifts>1 must keep shapes and stay finite; on a constant-zero
        input every shifted copy separates identically, so the average
        equals the unshifted output exactly."""
        from speech_diarization_tpu.models.demix import DialogDemixer
        from speech_diarization_tpu.pipelines.demix import EnsembleDemixer

        model = DialogDemixer(channels=8, depth=3, bottleneck_blocks=1)
        demixer = EnsembleDemixer(model=model, n_models=1, chunk_s=1.0,
                                  shifts=3, max_shift_s=0.1)
        wav = (np.random.default_rng(1).standard_normal((2, 2 * 44100)) * 0.1
               ).astype(np.float32)
        stems = demixer.separate(wav, 44100)
        assert stems.shape == (3, 2, wav.shape[-1])
        assert np.isfinite(stems).all()

        zero = np.zeros((2, 44100), np.float32)
        single = EnsembleDemixer(model=model,
                                 param_sets=demixer.param_sets, chunk_s=1.0)
        np.testing.assert_allclose(demixer.separate(zero, 44100),
                                   single.separate(zero, 44100), atol=1e-5)

    def test_separate_dialog_tree(self, tmp_path):
        from speech_diarization_tpu.io.audio import write_wav
        from speech_diarization_tpu.models.demix import DialogDemixer
        from speech_diarization_tpu.pipelines.demix import EnsembleDemixer, separate_dialog

        write_wav(tmp_path / "in" / "a.wav",
                  np.random.default_rng(0).standard_normal((2, 44100)).astype(np.float32) * 0.1,
                  44100)
        model = DialogDemixer(channels=8, depth=3, bottleneck_blocks=1)
        demixer = EnsembleDemixer(model=model, n_models=1, chunk_s=2.0)
        written = separate_dialog(tmp_path / "in", tmp_path / "out", demixer)
        assert len(written) == 3
        names = {p.parent.name for p in written}
        assert names == {"music", "effect", "dialog"}


def synth_conversation(turns, sr=16000, gap_s=0.5, seed=0):
    g = np.random.default_rng(seed)
    freqs = {0: 180.0, 1: 850.0}
    parts, starts, ends, spks = [], [], [], []
    t0 = 0.0
    for spk, dur in turns:
        parts.append(np.zeros(int(gap_s * sr), np.float32))
        t0 += gap_s
        t = np.arange(int(dur * sr)) / sr
        sig = 0.3 * np.sin(2 * np.pi * freqs[spk] * t)
        parts.append((sig + 0.005 * g.standard_normal(len(t))).astype(np.float32))
        starts.append(t0)
        ends.append(t0 + dur)
        spks.append(spk)
        t0 += dur
    parts.append(np.zeros(int(gap_s * sr), np.float32))
    return np.concatenate(parts), SegmentArray(
        np.array(starts), np.array(ends), np.array(spks, dtype=np.int32))


class TestBaselinePipeline:
    def test_end_to_end_with_stems(self, tmp_path):
        from speech_diarization_tpu.config import (
            AudioConfig, ClusterConfig, DiarizationConfig, StemsConfig,
        )
        from speech_diarization_tpu.io.audio import write_wav
        from speech_diarization_tpu.pipelines.baseline import Diarizer

        wave, truth = synth_conversation([(0, 4.0), (1, 4.0), (0, 3.5)])
        apath = tmp_path / "conv.wav"
        write_wav(apath, wave, 16000)

        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc", min_speakers=1, max_speakers=4),
            stems=StemsConfig(min_stem_s=2.0),
        )
        diarizer = Diarizer(cfg, encode_fn=_fake_encoder)
        segs, info = diarizer(apath, tmp_path / "stems", with_rttm=True)
        assert apath.with_suffix(".rttm").exists()
        assert len(segs) >= 2
        assert len(info) == 2  # two speakers got stems

    def test_batch_resume(self, tmp_path):
        from speech_diarization_tpu.config import (
            AudioConfig, ClusterConfig, DiarizationConfig, StemsConfig,
        )
        from speech_diarization_tpu.io.audio import write_wav
        from speech_diarization_tpu.pipelines.baseline import run_batch

        wave, _ = synth_conversation([(0, 3.0), (1, 3.0)])
        write_wav(tmp_path / "a.wav", wave, 16000)
        write_wav(tmp_path / "b.wav", wave, 16000)
        cfg = DiarizationConfig(
            audio=AudioConfig(target_lufs=None, preemphasis=None),
            cluster=ClusterConfig(method="ahc"),
            stems=StemsConfig(min_stem_s=1.0),
        )
        done = run_batch(tmp_path, cfg, encode_fn=_fake_encoder)
        assert len(done) == 2
        # second run: everything skipped
        done2 = run_batch(tmp_path, cfg, encode_fn=_fake_encoder)
        assert len(done2) == 0


class TestDiagnosticPipeline:
    def test_report_and_outputs(self, tmp_path):
        from speech_diarization_tpu.config import AudioConfig, DiarizationConfig
        from speech_diarization_tpu.pipelines.diagnostic import diagnose

        wave, truth = synth_conversation([(0, 3.0), (1, 3.0), (0, 2.5), (1, 2.5)])
        cfg = DiarizationConfig(audio=AudioConfig(target_lufs=None, preemphasis=None))
        report = diagnose((wave, 16000), cfg, out_dir=tmp_path,
                          cluster_method="ahc", encode_fn=_fake_encoder)
        assert len(report.segments) >= 2
        stats = report.similarity_stats()
        assert stats["adjacent_mean"] < stats["nonadjacent_mean"] + 1.0  # defined
        assert (tmp_path / "diarization.json").exists()
        assert (tmp_path / "diarization.srt").exists()
        assert (tmp_path / "diarization.csv").exists()
        assert (tmp_path / "sim_matrix.png").exists()
        assert (tmp_path / "sim_hists.png").exists()
        assert isinstance(report.tuning_hint(), str)


@pytest.mark.slow
class TestEnhanceBatch:
    def test_batch_with_resume(self, tmp_path):
        from speech_diarization_tpu.io.audio import write_wav
        from speech_diarization_tpu.pipelines.enhance import enhance_batch

        g = np.random.default_rng(0)
        write_wav(tmp_path / "x.wav", (0.1 * g.standard_normal(16000)).astype(np.float32), 16000)
        written = enhance_batch(tmp_path, backend="gtcrn", chunk_s=2.0)
        assert len(written) == 1
        assert written[0].exists()
        # resume skips
        written2 = enhance_batch(tmp_path, backend="gtcrn", chunk_s=2.0)
        assert len(written2) == 0


class TestTrainedDemixer:
    from pathlib import Path as _P

    DWEIGHTS = _P(__file__).resolve().parents[1] / "weights" / "demix_synthetic.npz"

    @pytest.mark.skipif(not DWEIGHTS.exists(), reason="demix weights not shipped")
    def test_shipped_demixer_improves_si_snr(self):
        from speech_diarization_tpu.train.recipes import load_demixer, si_snr_db
        from speech_diarization_tpu.train.synthetic import make_demix_example

        model, params = load_demixer(self.DWEIGHTS)
        fwd = jax.jit(lambda m: model.apply(params, m))
        g = np.random.default_rng(555)
        ms, ss = zip(*(make_demix_example(g, 1.0) for _ in range(3)))
        mix, stems = np.stack(ms), np.stack(ss)
        est = np.asarray(fwd(jnp.asarray(mix)))
        b, s, c, t = est.shape
        base = si_snr_db(np.broadcast_to(mix[:, None], stems.shape).reshape(-1, t),
                         stems.reshape(-1, t))
        sep = si_snr_db(est.reshape(-1, t), stems.reshape(-1, t))
        assert sep - base >= 3.0, f"stem SI-SNR gain only {sep - base:.2f} dB"
