"""Tests for on-device algorithmic primitives vs scipy/numpy oracles."""
import numpy as np
import pytest
import scipy.ndimage as ndi
import scipy.signal as sps

import jax.numpy as jnp

from speech_diarization_tpu import ops
from speech_diarization_tpu.ops.peaks import local_peak_mask
from speech_diarization_tpu.ops.segments import labels_to_segments, mask_edges


# ------------------------------------------------------------- hysteresis ----
def _hysteresis_oracle(probs, on, off):
    mask = np.zeros(len(probs), dtype=bool)
    talking = False
    for i, p in enumerate(probs):
        if not talking and p >= on:
            talking = True
        elif talking and p < off:
            talking = False
        mask[i] = talking
    return mask


class TestHysteresis:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.slow
    def test_matches_sequential_oracle(self, seed):
        g = np.random.default_rng(seed)
        probs = g.uniform(0, 1, size=5000).astype(np.float32)
        out = np.asarray(ops.hysteresis_binarize(jnp.asarray(probs), 0.6, 0.4))
        np.testing.assert_array_equal(out, _hysteresis_oracle(probs, 0.6, 0.4))

    def test_edge_thresholds(self):
        probs = np.array([0.5, 0.61, 0.5, 0.41, 0.39, 0.7, 0.39], np.float32)
        out = np.asarray(ops.hysteresis_binarize(jnp.asarray(probs), 0.6, 0.4))
        np.testing.assert_array_equal(out, _hysteresis_oracle(probs, 0.6, 0.4))


# ------------------------------------------------------------- morphology ----
class TestMorphology:
    @pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 8])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_opening_matches_scipy(self, k, seed):
        g = np.random.default_rng(seed)
        mask = g.uniform(size=400) > 0.5
        ref = ndi.binary_opening(mask, structure=np.ones(k, bool))
        out = np.asarray(ops.binary_opening(jnp.asarray(mask), k))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 8])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_closing_matches_scipy(self, k, seed):
        g = np.random.default_rng(seed)
        mask = g.uniform(size=400) > 0.5
        ref = ndi.binary_closing(mask, structure=np.ones(k, bool))
        out = np.asarray(ops.binary_closing(jnp.asarray(mask), k))
        np.testing.assert_array_equal(out, ref)

    def test_open_close_chain(self):
        g = np.random.default_rng(7)
        mask = g.uniform(size=1000) > 0.6
        ref = ndi.binary_closing(
            ndi.binary_opening(mask, structure=np.ones(8, bool)),
            structure=np.ones(4, bool),
        )
        out = np.asarray(ops.morph_open_close(jnp.asarray(mask), hop_ms=10.0,
                                              open_ms=80.0, close_ms=40.0))
        np.testing.assert_array_equal(out, ref)


# ------------------------------------------------------------------ peaks ----
class TestPeaks:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_scipy_find_peaks(self, seed):
        g = np.random.default_rng(seed)
        z = g.standard_normal(300).astype(np.float32)
        ref, _ = sps.find_peaks(z, height=1.0)
        mask = np.asarray(local_peak_mask(jnp.asarray(z))) & (z >= 1.0)
        np.testing.assert_array_equal(np.where(mask)[0], ref)

    def test_zscore_guard_constant_input(self):
        z = np.full(50, 0.3, np.float32)
        mask, zs = ops.find_peaks_zscore(jnp.asarray(z), 1.0)
        assert not np.asarray(mask).any()
        np.testing.assert_allclose(np.asarray(zs), z)  # unscaled passthrough


# ---------------------------------------------------------------- viterbi ----
def _viterbi_oracle(scores, alpha):
    """Sequential DP oracle mirroring diar_diag.py:231-247 semantics."""
    t, k = scores.shape
    eps = 1e-8
    log_a = np.full((k, k), np.log((1 - alpha) / max(k - 1, 1) + eps), np.float32)
    np.fill_diagonal(log_a, np.log(alpha + eps))
    dp = np.full((t, k), -1e9, np.float32)
    ptr = np.zeros((t, k), np.int32)
    dp[0] = scores[0]
    for i in range(1, t):
        prev = dp[i - 1][:, None] + log_a
        ptr[i] = np.argmax(prev, axis=0)
        dp[i] = prev[ptr[i], np.arange(k)] + scores[i]
    path = np.zeros(t, np.int32)
    path[-1] = int(np.argmax(dp[-1]))
    for i in range(t - 2, -1, -1):
        path[i] = ptr[i + 1, path[i + 1]]
    return path


class TestViterbi:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_dp_oracle(self, seed):
        g = np.random.default_rng(seed)
        scores = g.standard_normal((40, 4)).astype(np.float32)
        log_a = ops.sticky_transition_logits(4, 0.995)
        out = np.asarray(ops.viterbi_decode(jnp.asarray(scores), log_a))
        np.testing.assert_array_equal(out, _viterbi_oracle(scores, 0.995))

    def test_sticky_smooths_flicker(self):
        # one flickered frame inside a long run should be absorbed
        scores = np.full((20, 2), 0.0, np.float32)
        scores[:, 0] = 1.0
        scores[10, 0], scores[10, 1] = 0.0, 1.2  # weak flicker to state 1
        log_a = ops.sticky_transition_logits(2, 0.995)
        path = np.asarray(ops.viterbi_decode(jnp.asarray(scores), log_a))
        assert (path == 0).all()

    def test_single_state(self):
        scores = np.zeros((5, 1), np.float32)
        path = np.asarray(ops.viterbi_decode(jnp.asarray(scores),
                                             ops.sticky_transition_logits(1)))
        np.testing.assert_array_equal(path, np.zeros(5, np.int32))


# --------------------------------------------------------------- segments ----
class TestSegments:
    def test_mask_edges(self):
        mask = np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], bool)
        s, e = mask_edges(mask)
        np.testing.assert_array_equal(s, [1, 5, 7])
        np.testing.assert_array_equal(e, [3, 6, 10])

    def test_min_speech_filter_and_merge(self):
        # run A: frames 10-40 (300ms), gap 5 frames (50ms), run B: 45-80
        # run C at 200 too short (1 frame)
        mask = np.zeros(300, bool)
        mask[10:40] = True
        mask[45:80] = True
        mask[200:201] = True
        segs = ops.mask_to_segments_host(mask, hop_ms=10, min_speech_ms=250,
                                         min_gap_ms=100, speech_pad_ms=0)
        # A and B individually >= 250ms? A=300ms yes, B=350ms yes; gap 50<=100 merge
        assert len(segs) == 1
        np.testing.assert_allclose(segs.starts, [0.10])
        np.testing.assert_allclose(segs.ends, [0.80])

    def test_padding_clamped(self):
        mask = np.zeros(100, bool)
        mask[0:30] = True
        segs = ops.mask_to_segments_host(mask, 10, min_speech_ms=100,
                                         min_gap_ms=50, speech_pad_ms=80)
        assert segs.starts[0] == 0.0
        np.testing.assert_allclose(segs.ends, [0.38])

    def test_empty(self):
        segs = ops.mask_to_segments_host(np.zeros(50, bool), 10)
        assert len(segs) == 0

    def test_roundtrip_mask(self):
        mask = np.zeros(500, bool)
        mask[50:150] = True
        mask[300:420] = True
        segs = ops.mask_to_segments_host(mask, 10, min_speech_ms=100,
                                         min_gap_ms=10, speech_pad_ms=0)
        back = ops.segments_to_mask(segs, 500, 0.01)
        np.testing.assert_array_equal(back, mask)

    def test_labels_to_segments(self):
        starts = np.arange(10) * 0.1
        labels = np.array([-1, 0, 0, 1, 1, 1, -1, -1, 2, 2])
        segs = labels_to_segments(starts, labels, end_time_s=1.0)
        assert len(segs) == 3
        np.testing.assert_allclose(segs.starts, [0.1, 0.3, 0.8])
        np.testing.assert_allclose(segs.ends, [0.3, 0.6, 1.0])
        np.testing.assert_array_equal(segs.spks, [0, 1, 2])
