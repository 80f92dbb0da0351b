"""Clustering layer tests on synthetic Gaussian speaker blobs."""
import numpy as np
import pytest

import jax.numpy as jnp

from speech_diarization_tpu import cluster


def make_blobs(k=3, n_per=30, d=32, sep=4.0, seed=0):
    g = np.random.default_rng(seed)
    centers = g.standard_normal((k, d)) * sep
    x = np.concatenate([centers[i] + g.standard_normal((n_per, d)) for i in range(k)])
    y = np.repeat(np.arange(k), n_per)
    return x.astype(np.float32), y


def cluster_accuracy(pred, true):
    """Best-permutation agreement via greedy matching (k small)."""
    from scipy.optimize import linear_sum_assignment

    k1, k2 = pred.max() + 1, true.max() + 1
    conf = np.zeros((k1, k2))
    for p, t in zip(pred, true):
        if p >= 0:
            conf[p, t] += 1
    r, c = linear_sum_assignment(-conf)
    return conf[r, c].sum() / len(true)


class TestAffinity:
    def test_cosine_affinity_matches_sklearn(self):
        from sklearn.metrics.pairwise import cosine_similarity

        x, _ = make_blobs()
        ref = cosine_similarity(x)
        out = np.asarray(cluster.cosine_affinity(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_whiten_decorrelates(self):
        g = np.random.default_rng(0)
        base = g.standard_normal((500, 8))
        mix = g.standard_normal((8, 8)) + np.eye(8) * 2
        x = (base @ mix).astype(np.float32)
        w = np.asarray(cluster.whiten(jnp.asarray(x)))
        norms = np.linalg.norm(w, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # before normalization the whitened covariance is ~identity; after L2
        # norm rows are unit — correlation structure should still be far
        # weaker than the raw mix
        c_raw = np.corrcoef(x.T)
        c_w = np.corrcoef(w.T)
        off_raw = np.abs(c_raw - np.eye(8)).mean()
        off_w = np.abs(c_w - np.eye(8)).mean()
        assert off_w < off_raw * 0.5

    def test_asnorm_calibrates(self):
        """AS-Norm should make scores comparable across queries with
        different cohort similarity levels."""
        x, y = make_blobs(k=2, n_per=40, sep=5.0)
        centers = np.stack([x[y == i].mean(0) for i in range(2)])
        scores = np.asarray(cluster.asnorm_scores(
            jnp.asarray(x), jnp.asarray(centers), jnp.asarray(x), topk=20))
        assert scores.shape == (80, 2)
        # own-center score should exceed other-center score for most points
        correct = (np.argmax(scores, axis=1) == y).mean()
        assert correct > 0.95


class TestKmeans:
    def test_recovers_blobs(self):
        x, y = make_blobs(k=4, n_per=25, sep=5.0)
        labels, centers = cluster.kmeans(jnp.asarray(x), 4, k_max=8)
        labels = np.asarray(labels)
        assert cluster_accuracy(labels, y) > 0.97
        assert set(np.unique(labels)) <= set(range(4))

    def test_masked_k_below_kmax(self):
        x, y = make_blobs(k=2, n_per=30, sep=6.0)
        labels, _ = cluster.kmeans(jnp.asarray(x), 2, k_max=8)
        assert np.asarray(labels).max() <= 1

    def test_sample_weights_ignore_padding(self):
        x, y = make_blobs(k=2, n_per=30, sep=6.0)
        pad = np.zeros((10, x.shape[1]), np.float32)  # off-blob garbage at 0
        xp = np.concatenate([x, pad])
        w = np.concatenate([np.ones(60), np.zeros(10)]).astype(np.float32)
        labels, _ = cluster.kmeans(jnp.asarray(xp), 2, k_max=4,
                                   sample_weight=jnp.asarray(w))
        assert cluster_accuracy(np.asarray(labels)[:60], y) > 0.97


class TestSpectral:
    @pytest.mark.parametrize("k", [2, 3, 5])
    def test_finds_speaker_count_and_labels(self, k):
        x, y = make_blobs(k=k, n_per=30, sep=5.0, seed=k)
        labels = cluster.spectral_cluster(x, min_speakers=1, max_speakers=8)
        assert labels.max() + 1 == k
        assert cluster_accuracy(labels, y) > 0.97

    def test_single_cluster(self):
        g = np.random.default_rng(0)
        x = g.standard_normal((40, 16)).astype(np.float32) * 0.05 + 1.0
        labels = cluster.spectral_cluster(x, min_speakers=1, max_speakers=8)
        assert labels.max() == 0

    def test_respects_min_speakers(self):
        x, _ = make_blobs(k=2, n_per=30, sep=5.0)
        labels = cluster.spectral_cluster(x, min_speakers=2, max_speakers=6)
        assert labels.max() + 1 >= 2

    def test_tiny_inputs(self):
        assert cluster.spectral_cluster(np.zeros((0, 4), np.float32)).shape == (0,)
        assert (cluster.spectral_cluster(np.ones((1, 4), np.float32)) == 0).all()


class TestAhc:
    def test_threshold_clustering(self):
        x, y = make_blobs(k=3, n_per=20, sep=6.0)
        labels = cluster.ahc_cluster(x, cos_threshold=0.7)
        assert cluster_accuracy(labels, y) > 0.95

    def test_max_speaker_clamp(self):
        x, y = make_blobs(k=5, n_per=15, sep=6.0)
        labels = cluster.ahc_cluster(x, cos_threshold=0.99, max_speakers=3)
        assert labels.max() + 1 == 3


class TestHdbscan:
    def test_single_stage(self):
        x, y = make_blobs(k=3, n_per=25, sep=6.0)
        labels = cluster.hdbscan_cluster(x, min_cluster_size=5)
        mask = labels >= 0
        assert mask.mean() > 0.8
        assert cluster_accuracy(labels[mask], y[mask]) > 0.95

    def test_two_stage_merges_microclusters(self):
        """Each speaker emits two tight sub-blobs (over-clustered by stage 1);
        stage 2 must merge the sub-blob centroids back per speaker."""
        g = np.random.default_rng(5)
        speaker_centers = g.standard_normal((3, 32)) * 10.0
        xs, ys = [], []
        for spk in range(3):
            for sub in range(2):
                c = speaker_centers[spk] + g.standard_normal(32) * 0.8
                xs.append(c + 0.2 * g.standard_normal((15, 32)))
                ys.append(np.full(15, spk))
        x = np.concatenate(xs).astype(np.float32)
        y = np.concatenate(ys)
        labels = cluster.hdbscan_two_stage(x, min_cluster_size=2)
        mask = labels >= 0
        assert mask.mean() > 0.7
        assert cluster_accuracy(labels[mask], y[mask]) > 0.9

    def test_dispatcher(self):
        x, y = make_blobs(k=2, n_per=20, sep=6.0)
        for method in ["spectral", "ahc", "hdbscan", "hdbscan2"]:
            labels = cluster.cluster_embeddings(x, method=method)
            assert labels.shape == (40,)


@pytest.mark.slow
class TestSpectralScaleRegression:
    """1-hr 3-speaker regression: 1435 real segment embeddings from the TPU
    pipeline (tests/data/segembs_1hr_3spk.npz).  The dense fallback's trivial
    k=1 connectivity gap (~0.55) used to out-compete the genuine 3-block gap
    once enough above-threshold bridge edges thinned the block structure
    (correct at 713 segments, k=1 at 1435); candidates are now selected by
    similarity-mode separation instead of gap size."""

    def test_full_hour_segments_cluster_to_three(self):
        from pathlib import Path

        data = np.load(Path(__file__).parent / "data" / "segembs_1hr_3spk.npz")
        embs = data["embs"].astype(np.float32)
        assert embs.shape[0] == 1435
        for n in (713, 1435):
            labels = cluster.spectral_cluster(embs[:n], max_speakers=8)
            assert labels.max() + 1 == 3, f"n={n}: got {labels.max() + 1}"


class TestRefineByWindows:
    """Window-driven recursive bisection (cluster/spectral.py
    refine_labels_by_windows): rescues merged speaker pairs the affinity
    threshold left connected, without splitting true single speakers."""

    @staticmethod
    def _make_case(rng, cents, segs_per_spk=6, seg_s=3.0, win_s=1.0,
                   hop_s=0.1, noise=0.08):
        """Alternating-turn timeline; returns (segs, win_embs, starts_s,
        true_spk_per_seg)."""
        from speech_diarization_tpu.types import SegmentArray

        starts, ends, spk = [], [], []
        t = 0.0
        for i in range(segs_per_spk * len(cents)):
            s = i % len(cents)
            starts.append(t)
            ends.append(t + seg_s)
            spk.append(s)
            t += seg_s + 0.5
        total = t
        ws = np.arange(0, total - win_s + 1e-6, hop_s)
        we = np.zeros((len(ws), cents.shape[1]))
        for j, w0 in enumerate(ws):
            c = w0 + win_s / 2
            owner = -1
            for s0, e0, k in zip(starts, ends, spk):
                if s0 <= w0 and w0 + win_s <= e0:
                    owner = k
                    break
            base = cents[owner] if owner >= 0 else rng.standard_normal(cents.shape[1]) * 0.01
            we[j] = base + noise * rng.standard_normal(cents.shape[1])
        segs = SegmentArray(np.array(starts), np.array(ends),
                            np.zeros(len(starts), np.int32))
        return segs, we.astype(np.float32), ws, np.array(spk)

    def test_splits_merged_pair(self):
        from speech_diarization_tpu.cluster import refine_labels_by_windows

        rng = np.random.default_rng(0)
        # two distinct speakers (centroid cosine ~0.3), all segments labeled
        # as ONE cluster by a failed upstream clustering
        a = rng.standard_normal(32)
        b = rng.standard_normal(32)
        a /= np.linalg.norm(a)
        b = b - (b @ a) * a
        b = 0.35 * a + np.sqrt(1 - 0.35 ** 2) * b / np.linalg.norm(b)
        segs, we, ws, true_spk = self._make_case(rng, np.stack([a, b]))
        labels = np.zeros(len(true_spk), np.int32)
        out = refine_labels_by_windows(labels, segs, we, ws, 1.0, 8)
        assert out.max() + 1 == 2
        # split must match the true speaker partition (up to relabeling)
        assert len(np.unique(out[true_spk == 0])) == 1
        assert len(np.unique(out[true_spk == 1])) == 1

    def test_does_not_split_single_speaker(self):
        from speech_diarization_tpu.cluster import refine_labels_by_windows

        rng = np.random.default_rng(1)
        a = rng.standard_normal(32)
        a /= np.linalg.norm(a)
        segs, we, ws, true_spk = self._make_case(rng, a[None], segs_per_spk=12)
        labels = np.zeros(len(true_spk), np.int32)
        out = refine_labels_by_windows(labels, segs, we, ws, 1.0, 8)
        assert out.max() + 1 == 1

    def test_encoder_declared_threshold_gates_pipeline_refine(self, tmp_path):
        """An encoder whose npz meta declares ``refine_sub_cos <= 0``
        (calibration found NO single/merged separation on its cosine scale)
        must disable the pipeline's refine stage; a config override
        re-enables it (config.ClusterConfig.refine_sub_cos)."""
        from speech_diarization_tpu.models.port import (
            load_params_meta, update_params_meta, save_params_npz,
        )

        p = tmp_path / "enc.npz"
        save_params_npz({"w": np.zeros(3, np.float32)}, p,
                        meta={"streaming_stats": True})
        update_params_meta(p, refine_sub_cos=-1.0)
        meta = load_params_meta(p)
        assert meta["refine_sub_cos"] == -1.0
        assert meta["streaming_stats"] is True  # merge preserved

        # the pipeline resolution logic: encoder meta -> model attribute
        class FakeModel:
            refine_sub_cos = -1.0

        from speech_diarization_tpu.config import ClusterConfig

        cfg = ClusterConfig()
        thr = cfg.refine_sub_cos
        if thr is None:
            thr = getattr(FakeModel, "refine_sub_cos", None)
        assert not (cfg.refine_splits and thr > 0)  # refine stays off

        cfg2 = ClusterConfig(refine_sub_cos=0.5)  # explicit override wins
        thr2 = cfg2.refine_sub_cos
        assert cfg2.refine_splits and thr2 > 0

    def test_custom_threshold_respected(self):
        """A stricter sub_cos_thr must stop a split the default would make."""
        from speech_diarization_tpu.cluster import refine_labels_by_windows

        rng = np.random.default_rng(0)
        a = rng.standard_normal(32)
        b = rng.standard_normal(32)
        a /= np.linalg.norm(a)
        b = b - (b @ a) * a
        b = 0.35 * a + np.sqrt(1 - 0.35 ** 2) * b / np.linalg.norm(b)
        segs, we, ws, true_spk = self._make_case(rng, np.stack([a, b]))
        labels = np.zeros(len(true_spk), np.int32)
        out = refine_labels_by_windows(labels, segs, we, ws, 1.0, 8,
                                       sub_cos_thr=0.05)
        assert out.max() + 1 == 1  # threshold below the pair's sub-cos

    def test_too_few_windows_declines(self):
        from speech_diarization_tpu.cluster import refine_labels_by_windows

        rng = np.random.default_rng(2)
        a = rng.standard_normal(32); a /= np.linalg.norm(a)
        b = -a  # maximally distinct
        segs, we, ws, true_spk = self._make_case(
            rng, np.stack([a, b]), segs_per_spk=1, seg_s=1.2)
        labels = np.zeros(len(true_spk), np.int32)
        out = refine_labels_by_windows(labels, segs, we, ws, 1.0, 8)
        assert out.max() + 1 == 1  # below _SPLIT_MIN_WINDOWS: untouched
