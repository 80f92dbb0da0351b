"""Overlap rescue (segment/overlap.py): second-speaker segments from the
segmentation model's overlap detections on top of the flagship map.

Pure host-side logic — the only device work in production is the batched
segmentation dispatch, stubbed here with a deterministic activity oracle.
"""
import numpy as np
import pytest

from speech_diarization_tpu.segment.overlap import (
    add_overlap_segments,
    detect_overlap_regions,
)
from speech_diarization_tpu.types import SegmentArray


def _grid(starts, win_s, embs):
    return np.asarray(embs, np.float64), np.asarray(starts, np.float64), win_s


class TestDetectOverlapRegions:
    """Stub seg_fn: per-chunk activities derived from one GLOBAL frame mask,
    so center-trim tiling must reconstruct the global overlap spans."""

    def _seg_fn(self, global_two_active, f_per_chunk, stride_f):
        def fn(chunks):
            n = np.asarray(chunks).shape[0]
            acts = np.zeros((n, f_per_chunk, 2), np.float32)
            acts[:, :, 0] = 1.0  # speaker A always on
            for c in range(n):
                g = np.arange(c * stride_f, c * stride_f + f_per_chunk)
                g = np.clip(g, 0, len(global_two_active) - 1)
                acts[c, :, 1] = global_two_active[g]
            return acts

        fn.dual = False
        return fn

    def test_recovers_global_span(self):
        sr = 1000
        y = np.zeros(10 * sr, np.float32)  # 10 s
        total_f = 10 * 100 + 1
        mask = np.zeros(total_f, np.float32)
        mask[400:550] = 1.0  # 4.0-5.5 s overlapped
        fn = self._seg_fn(mask, f_per_chunk=501, stride_f=250)
        regions = detect_overlap_regions(y, sr, fn, chunk_s=5.0,
                                         chunk_hop_s=2.5)
        assert len(regions) == 1
        assert regions.starts[0] == pytest.approx(4.0, abs=0.02)
        assert regions.ends[0] == pytest.approx(5.5, abs=0.02)

    def test_min_on_drops_blips_and_min_gap_merges(self):
        sr = 1000
        y = np.zeros(10 * sr, np.float32)
        total_f = 10 * 100 + 1
        mask = np.zeros(total_f, np.float32)
        mask[100:110] = 1.0  # 100 ms blip: under min_on_s=0.3 -> dropped
        mask[300:340] = 1.0  # two spans split by an 80 ms hole
        mask[348:400] = 1.0  # -> merged by min_gap_s=0.15
        fn = self._seg_fn(mask, f_per_chunk=501, stride_f=250)
        regions = detect_overlap_regions(y, sr, fn, chunk_s=5.0,
                                         chunk_hop_s=2.5, min_on_s=0.3,
                                         min_gap_s=0.15)
        assert len(regions) == 1
        assert regions.starts[0] == pytest.approx(3.0, abs=0.02)
        assert regions.ends[0] == pytest.approx(4.0, abs=0.02)

    def test_no_overlap_empty(self):
        sr = 1000
        y = np.zeros(5 * sr, np.float32)
        mask = np.zeros(5 * 100 + 1, np.float32)
        fn = self._seg_fn(mask, f_per_chunk=501, stride_f=250)
        assert len(detect_overlap_regions(y, sr, fn)) == 0


class TestAddOverlapSegments:
    def _final_two_turns(self):
        # spk0: 0-5 s, spk1: 5-10 s
        return SegmentArray(np.array([0.0, 5.0]), np.array([5.0, 10.0]),
                            np.array([0, 1], np.int32))

    def _embs(self, n_win=19, win_s=1.0, hop_s=0.5):
        starts = np.arange(n_win) * hop_s
        e = np.zeros((n_win, 2))
        # spk0 windows point at [1,0]; spk1 windows at [0,1]
        centers = starts + win_s / 2
        e[centers < 5.0, 0] = 1.0
        e[centers >= 5.0, 1] = 1.0
        return e, starts, win_s

    def test_turn_change_region_adds_both_sides(self):
        final = self._final_two_turns()
        e, starts, win_s = self._embs()
        regions = SegmentArray.from_pairs([(4.5, 5.5)])  # spans the change
        out = add_overlap_segments(final, regions, e, starts, win_s)
        assert len(out) == len(final) + 2
        # both speakers now cover the full 4.5-5.5 region
        for spk in (0, 1):
            m = out.spks == spk
            inter = np.clip(np.minimum(out.ends[m], 5.5)
                            - np.maximum(out.starts[m], 4.5), 0, None)
            assert inter.sum() >= 1.0 - 1e-9

    def test_backchannel_region_matches_other_centroid(self):
        final = self._final_two_turns()
        e, starts, win_s = self._embs()
        # region in the middle of spk0's turn, but its windows look like spk1
        centers = starts + win_s / 2
        m = (centers >= 2.0) & (centers < 3.0)
        e[m] = [0.0, 1.0]
        regions = SegmentArray.from_pairs([(2.0, 3.0)])
        out = add_overlap_segments(final, regions, e, starts, win_s,
                                   min_cos=0.10)
        assert len(out) == len(final) + 1
        new = np.flatnonzero((out.starts == 2.0) & (out.ends == 3.0))
        assert len(new) == 1 and out.spks[new[0]] == 1

    def test_backchannel_below_cos_floor_skipped(self):
        final = self._final_two_turns()
        e, starts, win_s = self._embs()
        centers = starts + win_s / 2
        m = (centers >= 2.0) & (centers < 3.0)
        e[m] = [0.0, -1.0]  # anti-correlated with every centroid
        regions = SegmentArray.from_pairs([(2.0, 3.0)])
        out = add_overlap_segments(final, regions, e, starts, win_s,
                                   min_cos=0.10)
        assert len(out) == len(final)

    def test_sanity_cap_vetoes_hallucination(self):
        final = self._final_two_turns()
        e, starts, win_s = self._embs()
        regions = SegmentArray.from_pairs([(0.0, 9.0)])  # 90% "overlapped"
        out = add_overlap_segments(final, regions, e, starts, win_s,
                                   max_overlap_frac=0.5)
        assert len(out) == len(final)

    def test_region_outside_speech_skipped(self):
        # flagship says nothing at 11-12 s -> segmentation FA, no add
        final = self._final_two_turns()
        e, starts, win_s = self._embs()
        regions = SegmentArray.from_pairs([(11.0, 12.0)])
        out = add_overlap_segments(final, regions, e, starts, win_s)
        assert len(out) == len(final)

    def test_single_speaker_file_unchanged(self):
        final = SegmentArray(np.array([0.0]), np.array([10.0]),
                             np.array([0], np.int32))
        e, starts, win_s = self._embs()
        regions = SegmentArray.from_pairs([(2.0, 3.0)])
        out = add_overlap_segments(final, regions, e, starts, win_s)
        assert len(out) == 1


@pytest.mark.slow
class TestFusedStreamedDetector:
    """The streamed ingest's fused per-chunk overlap detector must agree
    with the standalone ``detect_overlap_regions`` (whole-file re-upload
    path) on the same audio — the fused path is what ships (the standalone
    rescue measured 687x -> 238x RTF on the 600 s bench)."""

    def test_fused_regions_match_standalone(self):
        from functools import partial

        import jax

        from speech_diarization_tpu.config import (
            ClusterConfig, DiarizationConfig, OverlapConfig,
        )
        from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
        from speech_diarization_tpu.pipelines.segmentation import (
            make_seg_activities_fn,
        )
        from speech_diarization_tpu.segment.overlap import (
            regions_from_hard_acts,
        )
        from speech_diarization_tpu.train.heldout import (
            make_conversation_heldout,
        )
        from speech_diarization_tpu.train.recipes import (
            load_segmentation, load_speaker_encoder, load_vad,
        )
        from speech_diarization_tpu.utils.weights import WEIGHTS_ROOT

        need = ["segmentation_conv.npz", "ecapa_robust_stream.npz",
                "vad_conv_mc.npz"]
        if any(not (WEIGHTS_ROOT / n).exists() for n in need):
            pytest.skip("shipped checkpoints required")
        model, params = load_speaker_encoder(
            WEIGHTS_ROOT / "ecapa_robust_stream.npz")
        vad, vp = load_vad(WEIGHTS_ROOT / "vad_conv_mc.npz")
        cfg = DiarizationConfig(
            cluster=ClusterConfig(method="spectral", max_speakers=8),
            overlap=OverlapConfig(enabled=True))
        pipe = DiarizationPipeline(cfg, encoder=(model, params),
                                   vad_probs_fn=jax.jit(partial(vad.probs, vp)))
        wave, _ = make_conversation_heldout(
            np.random.default_rng(4000), 60.0, n_speakers=3, sr=16000,
            overlap_frac=0.3)
        st = pipe._streamed_start(np.asarray(wave, np.float32), 16000)
        assert st is not None and st.get("ov"), "fused detector did not arm"
        pipe._streamed_collect(st)
        fused = regions_from_hard_acts(
            st["ov_acts"], len(wave) / 16000, chunk_hop_s=2.5,
            min_on_s=0.3, min_gap_s=0.15)

        sm, sp = load_segmentation(WEIGHTS_ROOT / "segmentation_conv.npz")
        seg_fn = make_seg_activities_fn(sm, sp)
        ref = detect_overlap_regions(np.asarray(wave, np.float32), 16000,
                                     seg_fn)
        assert len(fused) == len(ref)
        # int16 ingest quantization may flip a single borderline 10 ms
        # frame at a region edge
        np.testing.assert_allclose(fused.starts, ref.starts, atol=0.02)
        np.testing.assert_allclose(fused.ends, ref.ends, atol=0.02)

    def test_streamed_pipeline_emits_overlap(self):
        from functools import partial

        import jax

        from speech_diarization_tpu.config import (
            ClusterConfig, DiarizationConfig, OverlapConfig,
        )
        from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
        from speech_diarization_tpu.train.heldout import (
            make_conversation_heldout,
        )
        from speech_diarization_tpu.train.recipes import (
            load_speaker_encoder, load_vad,
        )
        from speech_diarization_tpu.utils.weights import WEIGHTS_ROOT

        need = ["segmentation_conv.npz", "ecapa_robust_stream.npz",
                "vad_conv_mc.npz"]
        if any(not (WEIGHTS_ROOT / n).exists() for n in need):
            pytest.skip("shipped checkpoints required")
        model, params = load_speaker_encoder(
            WEIGHTS_ROOT / "ecapa_robust_stream.npz")
        vad, vp = load_vad(WEIGHTS_ROOT / "vad_conv_mc.npz")
        cfg = DiarizationConfig(
            cluster=ClusterConfig(method="spectral", max_speakers=8),
            overlap=OverlapConfig(enabled=True))
        pipe = DiarizationPipeline(cfg, encoder=(model, params),
                                   vad_probs_fn=jax.jit(partial(vad.probs, vp)))
        wave, _ = make_conversation_heldout(
            np.random.default_rng(4000), 60.0, n_speakers=3, sr=16000,
            overlap_frac=0.3)
        segs = pipe((np.asarray(wave, np.float32), 16000)).segments
        ov = 0.0
        for i in range(len(segs)):
            for j in range(i + 1, len(segs)):
                if segs.spks[i] != segs.spks[j]:
                    ov += max(0.0, min(segs.ends[i], segs.ends[j])
                              - max(segs.starts[i], segs.starts[j]))
        assert ov > 0.5, f"no second-speaker time emitted ({ov:.2f}s)"
