"""Anchor tests for DER/JER against hand-computed md-eval semantics.

SURVEY.md §4 calls for the metric module to be "tested against published
examples".  pyannote.metrics / md-eval are not installable here (zero egress),
so these cases are hand-derived following the published NIST md-eval rules
(frame scoring, forgiveness collar around *reference* boundaries, Hungarian
optimal speaker mapping, miss/fa/confusion decomposition) with the full
derivation inline, so the numbers can be re-checked by hand or against
md-eval.pl when artifacts are available.
"""
import numpy as np
import pytest

from speech_diarization_tpu.metrics import diarization_error_rate, jaccard_error_rate
from speech_diarization_tpu.types import SegmentArray


def segs(*triples):
    starts, ends, spks = zip(*triples)
    return SegmentArray(np.array(starts), np.array(ends), np.array(spks))


class TestDerHandComputed:
    def test_confusion_only_no_collar(self):
        # ref: spk0 [0,10), spk1 [10,20).  hyp: A [0,8), B [8,20).
        # Optimal map spk0->A, spk1->B.  [8,10) is attributed to the wrong
        # speaker -> confusion 2 s over 20 s reference speech.
        ref = segs((0, 10, 0), (10, 20, 1))
        hyp = segs((0, 8, 0), (8, 20, 1))
        d = diarization_error_rate(ref, hyp, collar_s=0.0)
        assert d.miss == 0.0 and d.false_alarm == 0.0
        assert d.confusion == pytest.approx(2.0 / 20.0, abs=1e-6)
        assert d.der == pytest.approx(0.10, abs=1e-6)

    def test_confusion_with_quarter_second_collar(self):
        # Same as above with the NIST 0.25 s collar.  Reference boundaries at
        # t=0, 10, 20; excluded frames: [0,0.25) + [9.75,10.25) + [19.75,20).
        # Scored reference speech: 20 - (0.25 + 0.5 + 0.25) = 19 s.
        # Confusion region [8,10) loses its [9.75,10) tail -> 1.75 s.
        ref = segs((0, 10, 0), (10, 20, 1))
        hyp = segs((0, 8, 0), (8, 20, 1))
        d = diarization_error_rate(ref, hyp, collar_s=0.25)
        assert d.total_speech_s == pytest.approx(19.0, abs=0.02)
        assert d.der == pytest.approx(1.75 / 19.0, abs=1e-3)

    def test_miss_only(self):
        # ref spk0 [0,10); hyp covers only [0,6) -> 4 s missed / 10 s ref.
        ref = segs((0, 10, 0))
        hyp = segs((0, 6, 0))
        d = diarization_error_rate(ref, hyp, collar_s=0.0)
        assert d.miss == pytest.approx(0.4, abs=1e-6)
        assert d.false_alarm == 0.0 and d.confusion == 0.0
        assert d.der == pytest.approx(0.4, abs=1e-6)

    def test_false_alarm_only(self):
        # hyp hallucinates [12,15) where the reference has silence.
        # fa = 3 s / 10 s reference speech -> DER can exceed by fa alone.
        ref = segs((0, 10, 0))
        hyp = segs((0, 10, 0), (12, 15, 1))
        d = diarization_error_rate(ref, hyp, collar_s=0.0)
        assert d.false_alarm == pytest.approx(0.3, abs=1e-6)
        assert d.miss == 0.0 and d.confusion == 0.0

    def test_overlap_miss_and_skip_overlap(self):
        # ref: spk0 [0,10) and spk1 [5,10) overlap on [5,10).
        # Total reference speech = 10 + 5 = 15 speaker-seconds.
        # hyp finds only spk0 -> the overlapped spk1 speech is missed: 5/15.
        ref = segs((0, 10, 0), (5, 10, 1))
        hyp = segs((0, 10, 0))
        d = diarization_error_rate(ref, hyp, collar_s=0.0)
        assert d.miss == pytest.approx(5.0 / 15.0, abs=1e-3)
        assert d.der == pytest.approx(5.0 / 15.0, abs=1e-3)
        # skip_overlap drops frames with >1 reference speaker: remaining
        # scored region [0,5) is diarized perfectly.
        d2 = diarization_error_rate(ref, hyp, collar_s=0.0, skip_overlap=True)
        assert d2.der == pytest.approx(0.0, abs=1e-6)

    def test_speaker_label_permutation_invariance(self):
        # Hungarian mapping must make DER invariant to hyp label renaming.
        ref = segs((0, 5, 0), (5, 9, 1), (9, 14, 2))
        hyp_a = segs((0, 5.5, 0), (5.5, 9, 1), (9, 14, 2))
        hyp_b = segs((0, 5.5, 2), (5.5, 9, 0), (9, 14, 1))
        da = diarization_error_rate(ref, hyp_a, collar_s=0.0)
        db = diarization_error_rate(ref, hyp_b, collar_s=0.0)
        assert da.der == pytest.approx(db.der, abs=1e-9)
        # the 0.5 s [5,5.5) is confusion: 0.5 / 14
        assert da.der == pytest.approx(0.5 / 14.0, abs=1e-3)

    def test_perfect_is_zero_and_empty_hyp_is_total_miss(self):
        ref = segs((0, 10, 0), (10, 20, 1))
        assert diarization_error_rate(ref, ref, collar_s=0.0).der == 0.0
        empty = SegmentArray(np.zeros(0), np.zeros(0), np.zeros(0, dtype=int))
        d = diarization_error_rate(ref, empty, collar_s=0.0)
        assert d.der == pytest.approx(1.0, abs=1e-6)
        assert d.miss == pytest.approx(1.0, abs=1e-6)


class TestJerHandComputed:
    def test_two_speaker_example(self):
        # ref: spk0 [0,10), spk1 [10,20); hyp: A [0,8), B [8,20).
        # map spk0->A: inter 8, union 10 -> err 0.2
        # map spk1->B: inter 10, union 12 -> err 1/6
        # JER = mean(0.2, 1/6) = 11/60
        ref = segs((0, 10, 0), (10, 20, 1))
        hyp = segs((0, 8, 0), (8, 20, 1))
        assert jaccard_error_rate(ref, hyp) == pytest.approx(11.0 / 60.0, abs=1e-3)

    def test_unmapped_reference_speaker_scores_one(self):
        # hyp has a single speaker; ref spk1 has no match -> error 1.0 for it.
        # spk0->A: inter 10, union 10 -> 0.  JER = 0.5.
        ref = segs((0, 10, 0), (10, 20, 1))
        hyp = segs((0, 10, 0))
        assert jaccard_error_rate(ref, hyp) == pytest.approx(0.5, abs=1e-3)


class TestFfmpegStereoDecode:
    """VERDICT weak #5: the ffmpeg fallback must not flatten interleaved
    stereo into double-length mono.  ffmpeg isn't installed here, so the
    subprocess contract is exercised through stub executables."""

    @pytest.fixture
    def fake_tools(self, tmp_path, monkeypatch):
        ffprobe = tmp_path / "ffprobe"
        ffprobe.write_text("#!/bin/sh\necho 8000,2\n")
        ffmpeg = tmp_path / "ffmpeg"
        ffmpeg.write_text(
            "#!/usr/bin/env python3\n"
            "import sys, numpy as np\n"
            "args = sys.argv[1:]\n"
            "ac = int(args[args.index('-ac') + 1]) if '-ac' in args else 2\n"
            "ch0 = np.full(100, 0.25, np.float32)\n"
            "ch1 = np.full(100, -0.5, np.float32)\n"
            "if ac == 1:\n"
            "    out = (ch0 + ch1) / 2\n"
            "else:\n"
            "    out = np.stack([ch0, ch1], axis=1).ravel()\n"
            "sys.stdout.buffer.write(out.astype('<f4').tobytes())\n"
        )
        for p in (ffprobe, ffmpeg):
            p.chmod(0o755)

        from speech_diarization_tpu.io import audio as audio_mod

        monkeypatch.setattr(
            audio_mod.shutil, "which",
            lambda name: str(tmp_path / name) if name in ("ffmpeg", "ffprobe") else None,
        )
        return audio_mod

    def test_read_ffmpeg_deinterleaves(self, fake_tools, tmp_path):
        y, sr = fake_tools._read_ffmpeg(tmp_path / "fake.mp3")
        assert sr == 8000
        assert y.shape == (2, 100)
        np.testing.assert_allclose(y[0], 0.25)
        np.testing.assert_allclose(y[1], -0.5)

    def test_read_audio_mono_downmix(self, fake_tools, tmp_path):
        from speech_diarization_tpu.io.audio import read_audio

        y, sr = read_audio(tmp_path / "fake.mp3", target_sr=None, mono=True)
        assert y.ndim == 1 and len(y) == 100
        np.testing.assert_allclose(y, (0.25 - 0.5) / 2, atol=1e-6)

    def test_read_audio_no_probe_forces_mono(self, fake_tools, tmp_path, monkeypatch):
        # without ffprobe the channel count is unknown; -ac 1 must be passed
        monkeypatch.setattr(
            fake_tools.shutil, "which",
            lambda name: str(tmp_path / name) if name == "ffmpeg" else None,
        )
        y, sr = fake_tools._read_ffmpeg(tmp_path / "fake.mp3")
        assert y.shape == (1, 100)
        np.testing.assert_allclose(y[0], (0.25 - 0.5) / 2, atol=1e-6)
