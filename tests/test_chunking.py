"""Stitching exactness for fixed-shape chunked execution."""
import numpy as np

import jax.numpy as jnp

from speech_diarization_tpu.pipelines.chunking import chunked_framewise

SR = 16000
HOP = 160


def frame_identity(y_batch):
    """Deterministic framewise 'model': value of the sample at each frame
    start (lets us check stitched frame alignment exactly)."""
    t = y_batch.shape[-1]
    n = t // HOP + 1
    idx = jnp.arange(n) * HOP
    idx = jnp.minimum(idx, t - 1)
    return y_batch[..., idx]


class TestChunkedFramewise:
    def test_short_input_passthrough(self):
        y = np.arange(SR, dtype=np.float32)
        out = chunked_framewise(frame_identity, y, SR, HOP, chunk_s=30.0)
        ref = y[:: HOP]
        np.testing.assert_array_equal(out[: len(ref)], ref)
        assert out.shape[0] == SR // HOP + 1

    def test_long_input_stitching_exact(self):
        """Every stitched frame must equal the single-shot result, for a
        framewise fn that only depends on local samples.  (The final +1
        center-convention frame starts at t and is excluded — a real
        center=True model derives it from reflect padding.)"""
        t = int(95.5 * SR)  # forces 4 chunks of 30 s with 1 s overlap
        y = np.random.default_rng(0).standard_normal(t).astype(np.float32)
        out = chunked_framewise(frame_identity, y, SR, HOP,
                                chunk_s=30.0, overlap_s=1.0, group=3)
        n = t // HOP + 1
        assert out.shape == (n,)
        ref = y[np.arange(n - 1) * HOP]
        np.testing.assert_array_equal(out[: n - 1], ref)

    def test_group_boundary_variants(self):
        t = int(61.0 * SR)
        y = np.random.default_rng(1).standard_normal(t).astype(np.float32)
        for group in (1, 2, 4, 8):
            out = chunked_framewise(frame_identity, y, SR, HOP,
                                    chunk_s=30.0, overlap_s=1.0, group=group)
            n = t // HOP + 1
            ref = y[np.arange(n - 1) * HOP]
            np.testing.assert_array_equal(out[: n - 1], ref)
