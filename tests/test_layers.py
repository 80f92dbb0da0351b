"""Torch-oracle tests for the NN primitives (weight-port compatibility layer)."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from speech_diarization_tpu.models import layers


def _np(x):
    return x.detach().cpu().numpy()


class TestConv1d:
    @pytest.mark.parametrize("stride,pad,dil,groups", [
        (1, 0, 1, 1), (2, 2, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
    ])
    def test_matches_torch(self, stride, pad, dil, groups):
        g = np.random.default_rng(0)
        x = g.standard_normal((2, 8, 50)).astype(np.float32)
        w = g.standard_normal((16, 8 // groups, 3)).astype(np.float32)
        b = g.standard_normal(16).astype(np.float32)
        ref = _np(F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride, pad, dil, groups))
        out = np.asarray(layers.conv1d_torch(jnp.asarray(x), jnp.asarray(w),
                                             jnp.asarray(b), stride, pad, dil, groups))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestConv2d:
    @pytest.mark.parametrize("stride,pad,dil,groups", [
        ((1, 1), (0, 0), (1, 1), 1),
        ((1, 2), (0, 2), (1, 1), 1),
        ((1, 1), (0, 1), (2, 1), 16),   # GTCRN depthwise dilated
        ((1, 2), (0, 2), (1, 1), 2),    # GTCRN grouped conv
    ])
    def test_matches_torch(self, stride, pad, dil, groups):
        g = np.random.default_rng(1)
        c_in = 16
        c_out = 16
        x = g.standard_normal((2, c_in, 12, 33)).astype(np.float32)
        w = g.standard_normal((c_out, c_in // groups, 3, 3)).astype(np.float32)
        b = g.standard_normal(c_out).astype(np.float32)
        ref = _np(F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride, pad, dil, groups))
        out = np.asarray(layers.conv2d_torch(jnp.asarray(x), jnp.asarray(w),
                                             jnp.asarray(b), stride, pad, dil, groups))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestConvTranspose2d:
    @pytest.mark.parametrize("kh,kw,stride,pad,dil,groups", [
        (1, 5, (1, 2), (0, 2), (1, 1), 1),   # GTCRN decoder freq-upsample
        (1, 5, (1, 2), (0, 2), (1, 1), 2),   # grouped variant
        (3, 3, (1, 1), (10, 1), (5, 1), 16),  # GTCRN decoder depthwise deconv
        (1, 1, (1, 1), (0, 0), (1, 1), 1),   # pointwise deconv
        (3, 3, (2, 2), (1, 1), (1, 1), 1),
    ])
    def test_matches_torch(self, kh, kw, stride, pad, dil, groups):
        g = np.random.default_rng(2)
        c_in, c_out = 16, 16
        x = g.standard_normal((2, c_in, 24, 33)).astype(np.float32)
        w = g.standard_normal((c_in, c_out // groups, kh, kw)).astype(np.float32)
        b = g.standard_normal(c_out).astype(np.float32)
        ref = _np(F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                     torch.from_numpy(b), stride, pad,
                                     output_padding=0, groups=groups, dilation=dil))
        out = np.asarray(layers.conv_transpose2d_torch(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, pad, dil, groups))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestNormActs:
    def test_batch_norm_inference(self):
        g = np.random.default_rng(3)
        x = g.standard_normal((2, 8, 10, 5)).astype(np.float32)
        bn = torch.nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(g.standard_normal(8).astype(np.float32)))
            bn.running_var.copy_(torch.from_numpy(g.uniform(0.5, 2, 8).astype(np.float32)))
            bn.weight.copy_(torch.from_numpy(g.standard_normal(8).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(g.standard_normal(8).astype(np.float32)))
            ref = _np(bn(torch.from_numpy(x)))
        out = np.asarray(layers.batch_norm_apply(
            jnp.asarray(x), jnp.asarray(_np(bn.running_mean)),
            jnp.asarray(_np(bn.running_var)), jnp.asarray(_np(bn.weight)),
            jnp.asarray(_np(bn.bias))))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_prelu_scalar(self):
        x = np.linspace(-2, 2, 24).reshape(2, 3, 4).astype(np.float32)
        m = torch.nn.PReLU()
        ref = _np(m(torch.from_numpy(x)))
        out = np.asarray(layers.prelu(jnp.asarray(x), jnp.asarray(_np(m.weight))))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_layer_norm_2d_shape(self):
        g = np.random.default_rng(4)
        x = g.standard_normal((2, 6, 33, 16)).astype(np.float32)
        ln = torch.nn.LayerNorm((33, 16), eps=1e-8)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(g.standard_normal((33, 16)).astype(np.float32)))
            ln.bias.copy_(torch.from_numpy(g.standard_normal((33, 16)).astype(np.float32)))
        ref = _np(ln(torch.from_numpy(x)))
        out = np.asarray(layers.layer_norm_apply(
            jnp.asarray(x), jnp.asarray(_np(ln.weight)), jnp.asarray(_np(ln.bias))))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestGru:
    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_torch_gru(self, reverse):
        g = np.random.default_rng(5)
        d, h, b, t = 8, 16, 3, 20
        x = g.standard_normal((b, t, d)).astype(np.float32)
        m = torch.nn.GRU(d, h, batch_first=True, bidirectional=False)
        params = layers.GRUParams(
            jnp.asarray(_np(m.weight_ih_l0)), jnp.asarray(_np(m.weight_hh_l0)),
            jnp.asarray(_np(m.bias_ih_l0)), jnp.asarray(_np(m.bias_hh_l0)))
        if reverse:
            xin = torch.from_numpy(x[:, ::-1].copy())
        else:
            xin = torch.from_numpy(x)
        with torch.no_grad():
            ref, href = m(xin)
        ref = _np(ref)
        if reverse:
            ref = ref[:, ::-1]
        out, hlast = layers.gru_sequence(jnp.asarray(x), params, reverse=reverse)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(hlast), _np(href)[0], atol=1e-4)

    def test_bigru_matches_torch(self):
        g = np.random.default_rng(6)
        d, h, b, t = 8, 6, 2, 15
        x = g.standard_normal((b, t, d)).astype(np.float32)
        m = torch.nn.GRU(d, h, batch_first=True, bidirectional=True)
        fwd = layers.GRUParams(
            jnp.asarray(_np(m.weight_ih_l0)), jnp.asarray(_np(m.weight_hh_l0)),
            jnp.asarray(_np(m.bias_ih_l0)), jnp.asarray(_np(m.bias_hh_l0)))
        bwd = layers.GRUParams(
            jnp.asarray(_np(m.weight_ih_l0_reverse)), jnp.asarray(_np(m.weight_hh_l0_reverse)),
            jnp.asarray(_np(m.bias_ih_l0_reverse)), jnp.asarray(_np(m.bias_hh_l0_reverse)))
        with torch.no_grad():
            ref, _ = m(torch.from_numpy(x))
        out, _ = layers.bigru_sequence(jnp.asarray(x), fwd, bwd)
        np.testing.assert_allclose(np.asarray(out), _np(ref), atol=1e-4)


class TestSlidingMeanTime:
    """Both sliding-mean backends against a brute-force clamped-window mean.

    The banded backend is the streaming trunk's hot path (VERDICT r4 #4:
    the sliding-stat chains were the trunk's VPU residual — the band matmul
    moves them onto the MXU); the cumsum backend is the general fallback
    for windows wider than the 3-block band."""

    def _ref(self, x, win):
        h0, h1 = win // 2, win - 1 - win // 2
        t = x.shape[-1]
        out = np.zeros_like(x)
        for p in range(t):
            lo, hi = max(p - h0, 0), min(p + h1 + 1, t)
            out[..., p] = x[..., lo:hi].mean(-1)
        return out

    def test_backends_match_reference(self):
        g = np.random.default_rng(3)
        for t, win in [(50, 7), (100, 201), (33, 33), (10, 4), (7, 20),
                       (300, 257), (513, 128)]:
            x = g.standard_normal((2, 5, t)).astype(np.float32)
            ref = self._ref(x, win)
            for backend in ("banded", "cumsum"):
                got = np.asarray(layers.sliding_mean_time(
                    jnp.asarray(x), win, backend=backend))
                np.testing.assert_allclose(got, ref, atol=1e-5,
                                           err_msg=f"{backend} t={t} win={win}")

    def test_banded_differentiable(self):
        import jax

        g = np.random.default_rng(4)
        x = jnp.asarray(g.standard_normal((3, 40)).astype(np.float32))
        grad = jax.grad(lambda v: layers.sliding_mean_time(
            v, 9, backend="banded").sum())(x)
        # sum-of-means gradient: each input position contributes 1/cnt to
        # every window containing it; all finite, strictly positive
        assert np.isfinite(np.asarray(grad)).all()
        assert (np.asarray(grad) > 0).all()
