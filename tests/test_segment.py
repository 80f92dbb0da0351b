"""Segment layer tests: VAD post-chain, embedding grids, SCD, merges, reassign."""
import numpy as np
import pytest

import jax.numpy as jnp

from speech_diarization_tpu import segment
from speech_diarization_tpu.config import VadConfig
from speech_diarization_tpu.types import SegmentArray


class TestVadPost:
    def test_clean_probs_to_segments(self):
        probs = np.zeros(1000, np.float32)
        probs[100:400] = 0.9
        probs[600:800] = 0.9
        segs = segment.vad_segments_from_probs(probs, VadConfig(speech_pad_ms=0))
        assert len(segs) == 2
        np.testing.assert_allclose(segs.starts, [1.0, 6.0], atol=0.1)
        np.testing.assert_allclose(segs.ends, [4.0, 8.0], atol=0.1)

    def test_flicker_suppressed(self):
        g = np.random.default_rng(0)
        probs = np.full(500, 0.1, np.float32)
        probs[200:300] = 0.9
        # single-frame spikes elsewhere must not produce segments
        probs[50] = 0.95
        probs[400] = 0.95
        segs = segment.vad_segments_from_probs(probs, VadConfig(speech_pad_ms=0))
        assert len(segs) == 1
        assert abs(segs.starts[0] - 2.0) < 0.1

    def test_energy_veto_kills_silent_gap(self):
        # the net leaks p>on_threshold into a digital-silence gap between
        # two turns (measured failure mode on held-out LPC speech): the
        # energy veto must cut the gap regardless of the probabilities
        probs = np.full(1000, 0.2, np.float32)
        probs[100:400] = 0.9
        probs[400:500] = 0.75   # leaked probs inside the silent gap
        probs[500:800] = 0.9
        energy = np.full(1000, -20.0, np.float32)
        energy[400:500] = -80.0  # 1 s of near-digital silence
        cfg = VadConfig(speech_pad_ms=0)
        segs = segment.vad_segments_from_probs(
            probs, cfg, frame_energy_db=energy)
        assert len(segs) == 2
        np.testing.assert_allclose(segs.ends[0], 4.0, atol=0.1)
        np.testing.assert_allclose(segs.starts[1], 5.0, atol=0.1)
        # without energy the leak bridges the gap into one segment
        assert len(segment.vad_segments_from_probs(probs, cfg)) == 1

    def test_energy_veto_spares_stop_closures(self):
        # short (<energy_veto_min_ms) low-energy runs inside words — stop
        # closures — must NOT be vetoed
        probs = np.full(600, 0.1, np.float32)
        probs[100:400] = 0.9
        energy = np.full(600, -20.0, np.float32)
        energy[200:208] = -80.0  # 80 ms closure inside the word
        cfg = VadConfig(speech_pad_ms=0)
        segs = segment.vad_segments_from_probs(
            probs, cfg, frame_energy_db=energy)
        assert len(segs) == 1
        np.testing.assert_allclose(segs.starts[0], 1.0, atol=0.1)
        np.testing.assert_allclose(segs.ends[0], 4.0, atol=0.1)

    def test_energy_veto_disabled(self):
        probs = np.full(300, 0.1, np.float32)
        probs[50:250] = 0.9
        energy = np.full(300, -90.0, np.float32)  # all "silent"
        cfg = VadConfig(speech_pad_ms=0, energy_floor_db=None)
        segs = segment.vad_segments_from_probs(
            probs, cfg, frame_energy_db=energy)
        assert len(segs) == 1

    def test_frame_energy_chunk_shape_and_values(self):
        hop = 160
        y = np.zeros(16000, np.float32)
        y[1600:3200] = 0.5  # 1 s..2 s loud
        e = np.asarray(segment.frame_energy_db_chunk(jnp.asarray(y), hop))
        assert e.shape == (16000 // hop + 1,)
        assert e[15] > -8.0    # inside the loud region: 10*log10(0.25)
        assert e[50] < -100.0  # silence
        assert e[-1] == -120.0 # the center-convention pad frame


def _fake_encoder(freqs=(100.0, 300.0)):
    """Deterministic 'embedder': 8-d spectral energy signature of the window.
    Perfectly separates sine 'speakers' -> lets us test pipeline logic without
    trained weights (SURVEY.md §4 synthetic two-speaker strategy)."""
    def encode(wavs):  # [B, T] jnp
        w = np.asarray(wavs)
        spec = np.abs(np.fft.rfft(w, axis=1))
        n = spec.shape[1]
        bands = np.array_split(np.arange(n), 8)
        feats = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
        feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
        return jnp.asarray(feats.astype(np.float32))
    return encode


def two_speaker_wave(sr=16000, turn_s=2.0, n_turns=4):
    """Alternating 220 Hz / 1200 Hz 'speakers' with known boundaries."""
    rng = np.random.default_rng(0)
    parts, truth = [], []
    t0 = 0.0
    for i in range(n_turns):
        f = 220.0 if i % 2 == 0 else 1200.0
        t = np.arange(int(turn_s * sr)) / sr
        sig = 0.3 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t))
        parts.append(sig.astype(np.float32))
        truth.append((t0, t0 + turn_s, i % 2))
        t0 += turn_s
    return np.concatenate(parts), truth


class TestEmbedGrid:
    def test_window_grid_embeddings(self):
        y, _ = two_speaker_wave()
        enc = _fake_encoder()
        embs = segment.embed_windows(enc, jnp.asarray(y), 16000, 1.0, 0.5, batch=8)
        starts = segment.window_starts(len(y), 16000, 1.0, 0.5)
        assert embs.shape[0] == starts.shape[0]
        # windows within one speaker turn should be near-identical
        e = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        assert e[0] @ e[1] > 0.99
        # windows across speakers should differ
        assert e[0] @ e[4] < 0.9

    def test_segment_embeddings_from_grid(self):
        y, truth = two_speaker_wave()
        enc = _fake_encoder()
        embs = segment.embed_windows(enc, jnp.asarray(y), 16000, 1.0, 0.5, batch=8)
        starts_s = segment.window_starts(len(y), 16000, 1.0, 0.5) / 16000
        segs = SegmentArray.from_pairs([(s, e) for s, e, _ in truth])
        se = segment.segment_embeddings_from_grid(embs, starts_s, 1.0, segs)
        assert se.shape == (4, embs.shape[1])
        n = se / np.linalg.norm(se, axis=1, keepdims=True)
        assert n[0] @ n[2] > 0.98  # same speaker
        assert n[0] @ n[1] < 0.9   # different speaker

    def test_bucketed_matches_grid_speakers(self):
        y, truth = two_speaker_wave()
        enc = _fake_encoder()
        segs = SegmentArray.from_pairs([(s, e) for s, e, _ in truth])
        se = segment.embed_segments_bucketed(enc, y, 16000, segs, batch=4)
        assert se.shape[0] == 4
        n = se / np.linalg.norm(se, axis=1, keepdims=True)
        assert n[0] @ n[2] > 0.98
        assert n[0] @ n[1] < 0.9

    def test_short_segment_fallback(self):
        y, _ = two_speaker_wave()
        enc = _fake_encoder()
        embs = segment.embed_windows(enc, jnp.asarray(y), 16000, 1.0, 0.5, batch=8)
        starts_s = segment.window_starts(len(y), 16000, 1.0, 0.5) / 16000
        segs = SegmentArray.from_pairs([(0.1, 0.25)])  # shorter than any window
        se = segment.segment_embeddings_from_grid(embs, starts_s, 1.0, segs)
        assert np.isfinite(se).all() and np.linalg.norm(se) > 0


class TestScd:
    def test_splits_at_speaker_change(self):
        y, truth = two_speaker_wave(turn_s=3.0, n_turns=2)  # change at t=3
        enc = _fake_encoder()
        embs = segment.embed_windows(enc, jnp.asarray(y), 16000, 1.0, 0.2, batch=16)
        starts_s = segment.window_starts(len(y), 16000, 1.0, 0.2) / 16000
        segs = SegmentArray.from_pairs([(0.0, 6.0)])  # VAD saw one segment
        out = segment.scd_split(segs, embs, starts_s, 1.0, 0.2,
                                z_threshold=1.5, min_speech_s=1.0)
        assert len(out) == 2
        assert abs(out.ends[0] - 3.0) < 0.4
        assert abs(out.starts[1] - 3.0) < 0.4

    def test_no_split_single_speaker(self):
        sr = 16000
        t = np.arange(6 * sr) / sr
        y = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        enc = _fake_encoder()
        embs = segment.embed_windows(enc, jnp.asarray(y), sr, 1.0, 0.2, batch=16)
        starts_s = segment.window_starts(len(y), sr, 1.0, 0.2) / sr
        segs = SegmentArray.from_pairs([(0.0, 6.0)])
        out = segment.scd_split(segs, embs, starts_s, 1.0, 0.2)
        assert len(out) == 1


class TestMerge:
    def test_merge_adjacent(self):
        segs = SegmentArray(np.array([0.0, 1.02, 3.0]), np.array([1.0, 2.0, 4.0]),
                            np.array([0, 0, 0]))
        out = segment.merge_adjacent(segs, gap_s=0.05)
        assert len(out) == 2
        np.testing.assert_allclose(out.ends[0], 2.0)

    def test_merge_adjacent_respects_speaker(self):
        segs = SegmentArray(np.array([0.0, 1.02]), np.array([1.0, 2.0]),
                            np.array([0, 1]))
        out = segment.merge_adjacent(segs, gap_s=0.5)
        assert len(out) == 2

    def test_conservative_merge_gates_on_cosine(self):
        segs = SegmentArray(np.array([0.0, 1.1, 2.2]), np.array([1.0, 2.0, 3.0]),
                            np.array([0, 0, 0]))
        e0 = np.array([1.0, 0, 0, 0], np.float32)
        e_sim = np.array([0.95, 0.1, 0, 0], np.float32)
        e_diff = np.array([0.0, 1.0, 0, 0], np.float32)
        embs = np.stack([e0, e_sim, e_diff])
        out, out_embs = segment.conservative_merge(segs, embs, max_gap_s=0.5,
                                                   max_turn_s=30, min_cos=0.8)
        assert len(out) == 2  # first two merged, third kept (cosine fails)
        assert out_embs.shape[0] == 2

    def test_conservative_merge_max_turn(self):
        segs = SegmentArray(np.array([0.0, 10.1]), np.array([10.0, 40.0]),
                            np.array([0, 0]))
        embs = np.tile(np.array([1.0, 0, 0, 0], np.float32), (2, 1))
        out, _ = segment.conservative_merge(segs, embs, max_gap_s=0.5,
                                            max_turn_s=30.0, min_cos=0.5)
        assert len(out) == 2  # merged span would exceed 30 s

    def test_merge_same_speaker_maxlen(self):
        segs = SegmentArray(np.array([0.0, 21.0]), np.array([20.5, 22.0]),
                            np.array([0, 0]))
        out = segment.merge_same_speaker(segs, max_gap_s=1.0, max_segment_s=20.0)
        assert len(out) == 2  # current run already >= 20s -> no merge

    def test_adjust_boundaries(self):
        segs = SegmentArray(np.array([0.0, 2.0]), np.array([1.0, 3.0]),
                            np.array([0, 1]))
        out = segment.adjust_segment_boundaries(segs, padding_s=0.1)
        np.testing.assert_allclose(out.ends[0], 1.1)
        np.testing.assert_allclose(out.starts[1], 1.9)

    def test_adjust_boundaries_skips_small_gap(self):
        segs = SegmentArray(np.array([0.0, 1.05]), np.array([1.0, 2.0]),
                            np.array([0, 1]))
        out = segment.adjust_segment_boundaries(segs, padding_s=0.1)
        np.testing.assert_allclose(out.ends[0], 1.0)

    def test_filter_short(self):
        segs = SegmentArray(np.array([0.0, 2.0]), np.array([0.2, 3.0]),
                            np.array([0, 1]))
        out = segment.filter_short_segments(segs, 0.35)
        assert len(out) == 1 and out.spks[0] == 1


class TestReassign:
    def test_reassign_recovers_boundary(self):
        """Clustering put the boundary 0.5s off; reassignment with the dense
        grid should pull it back to the true change point."""
        y, truth = two_speaker_wave(turn_s=3.0, n_turns=2)
        sr = 16000
        enc = _fake_encoder()
        win_embs = segment.embed_windows(enc, jnp.asarray(y), sr, 1.0, 0.1, batch=32)
        starts_s = segment.window_starts(len(y), sr, 1.0, 0.1) / sr

        speech = SegmentArray.from_pairs([(0.0, 6.0)])
        labeled = SegmentArray(np.array([0.0, 3.5]), np.array([3.5, 6.0]),
                               np.array([0, 1]))
        seg_embs = segment.segment_embeddings_from_grid(
            win_embs, starts_s, 1.0, SegmentArray(np.array([0.0, 3.0]),
                                                  np.array([3.0, 6.0]),
                                                  np.array([0, 1])))
        out = segment.frame_reassign(speech, labeled, seg_embs, win_embs,
                                     starts_s, 1.0, 6.0)
        assert len(out) == 2
        assert out.spks[0] != out.spks[1]
        assert abs(out.ends[0] - 3.0) < 0.6

    def test_speaker_centroids_labels(self):
        segs = SegmentArray(np.array([0.0, 1.0, 2.0]), np.array([1.0, 2.0, 3.0]),
                            np.array([2, -1, 5]))
        embs = np.eye(3, 4, dtype=np.float32)
        ids, cents = segment.speaker_centroids(segs, embs)
        np.testing.assert_array_equal(ids, [2, 5])
        assert cents.shape == (2, 4)

    def test_reassign_with_hmm(self):
        y, _ = two_speaker_wave(turn_s=3.0, n_turns=2)
        sr = 16000
        enc = _fake_encoder()
        win_embs = segment.embed_windows(enc, jnp.asarray(y), sr, 1.0, 0.1, batch=32)
        starts_s = segment.window_starts(len(y), sr, 1.0, 0.1) / sr
        speech = SegmentArray.from_pairs([(0.0, 6.0)])
        labeled = SegmentArray(np.array([0.0, 3.0]), np.array([3.0, 6.0]),
                               np.array([0, 1]))
        seg_embs = segment.segment_embeddings_from_grid(win_embs, starts_s, 1.0, labeled)
        out = segment.frame_reassign(speech, labeled, seg_embs, win_embs,
                                     starts_s, 1.0, 6.0, hmm=True,
                                     hmm_self_loop=0.9)
        assert len(out) == 2


class TestScdHostPeaks:
    def test_numpy_peaks_match_device_op(self):
        """scd_split's host peak-picker must equal ops.peaks.find_peaks_zscore
        (it replaced per-segment eager jnp calls that cost a tunnel round
        trip each — 4.6 s/file on the axon chip)."""
        import jax.numpy as jnp

        from speech_diarization_tpu.ops.peaks import find_peaks_zscore
        from speech_diarization_tpu.segment.scd import _peaks_zscore_np

        g = np.random.default_rng(0)
        for n in (3, 10, 57):
            for scale in (1.0, 1e-8):
                d = (g.standard_normal(n) * scale).astype(np.float32)
                ref_mask, _ = find_peaks_zscore(jnp.asarray(d), 1.5)
                np.testing.assert_array_equal(
                    _peaks_zscore_np(d, 1.5), np.asarray(ref_mask))
