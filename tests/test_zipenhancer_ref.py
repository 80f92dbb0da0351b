"""Faithful ZipEnhancer graph: port-loader contract + torch piecewise parity.

The real ``iic/speech_zipenhancer_ans_multiloss_16k_base`` artifact is
unavailable under zero egress, so (mirroring ``test_ecapa_parity``) the
loader contract is proven by round-tripping a random-initialized state_dict,
and the numerics of every primitive with non-obvious torch semantics are
proven against torch oracles built here (InstanceNorm2d, PReLU, depthwise
Conv1d, MP-SENet SPConvTranspose2d / DenseBlock, icefall rel-shift).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from speech_diarization_tpu.models import zipenhancer_ref as zr
from speech_diarization_tpu.models.port_zipenhancer import (
    load_zipenhancer_modelscope, zipenhancer_manifest,
)

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)


def tiny_model() -> zr.ZipEnhancerRef:
    return zr.ZipEnhancerRef(
        n_fft=400, hop=100, dense_channel=16, num_tsblocks=1, num_layers=1,
        heads=2, query_head_dim=8, pos_head_dim=4, value_head_dim=8,
        pos_dim=16, feedforward_dim=48, conv_kernel=7)


@pytest.fixture(scope="module")
def tiny():
    m = tiny_model()
    return m, m.init(jax.random.PRNGKey(0))


class TestGraph:
    def test_apply_shape_and_finiteness(self, tiny):
        m, p = tiny
        wav = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((2, 4000)).astype(np.float32) * 0.1)
        out = m.apply(p, wav)
        assert out.shape == (2, 4000)
        assert bool(jnp.isfinite(out).all())

    def test_mask_bounded(self, tiny):
        """Magnitude mask is (0, beta)-bounded by the learnable sigmoid."""
        m, p = tiny
        rng = np.random.default_rng(1)
        mag = jnp.asarray(np.abs(rng.standard_normal((1, 9, m.n_bins))
                                 ).astype(np.float32))
        pha = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 9, m.n_bins))
                          .astype(np.float32))
        mag_d, pha_d = m.apply_spec(p, mag, pha)
        ratio = np.asarray(mag_d) / np.asarray(mag)
        assert ratio.min() >= 0.0 and ratio.max() <= m.beta + 1e-5
        assert np.abs(np.asarray(pha_d)).max() <= np.pi + 1e-5

    def test_manifest_matches_init(self, tiny):
        m, p = tiny
        man = zipenhancer_manifest(m)
        assert set(man) == set(p)
        for k, v in p.items():
            assert tuple(v.shape) == man[k], k


class TestPortLoader:
    def test_roundtrip_via_fake_modelscope_state_dict(self, tiny):
        """Random init → torch-style state_dict (wrapper prefix + training
        junk) → loader → identical outputs."""
        m, p = tiny
        sd = {f"model.generator.{k}": torch.from_numpy(np.asarray(v))
              for k, v in p.items()}
        # training-only entries the loader must drop
        sd["model.generator.encoder.balancer.count"] = torch.zeros(1)
        sd["model.discriminator.conv.weight"] = torch.zeros(3, 3)
        sd["model.generator.norm.num_batches_tracked"] = torch.zeros((),
                                                                     dtype=torch.long)
        loaded = load_zipenhancer_modelscope(sd, m)
        assert set(loaded) == set(p)
        wav = jnp.asarray(np.random.default_rng(2)
                          .standard_normal((1, 3200)).astype(np.float32) * 0.1)
        np.testing.assert_array_equal(
            np.asarray(m.apply(p, wav)), np.asarray(m.apply(loaded, wav)))

    def test_strict_shape_mismatch_raises(self, tiny):
        m, p = tiny
        sd = {k: np.asarray(v) for k, v in p.items()}
        bad = next(k for k in sd if k.endswith(".weight"))
        sd[bad] = np.zeros((1, 1), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            load_zipenhancer_modelscope(sd, m)

    def test_strict_missing_key_raises(self, tiny):
        m, p = tiny
        sd = {k: np.asarray(v) for k, v in p.items()}
        sd.pop(next(iter(sd)))
        with pytest.raises(ValueError, match="missing"):
            load_zipenhancer_modelscope(sd, m)


class TestTorchParity:
    """Primitive-level golden tests vs torch oracles (the semantics the
    relabel port relies on)."""

    def test_instance_norm2d(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, 11)).astype(np.float32)
        w = rng.standard_normal(5).astype(np.float32)
        b = rng.standard_normal(5).astype(np.float32)
        t = torch.nn.InstanceNorm2d(5, affine=True)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(w))
            t.bias.copy_(torch.from_numpy(b))
            ref = t(torch.from_numpy(x)).numpy()
        p = {"n.weight": jnp.asarray(w), "n.bias": jnp.asarray(b)}
        out = np.asarray(zr.instance_norm2d(p, "n", jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_prelu(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5, 3, 4)).astype(np.float32)
        a = rng.uniform(0.1, 0.5, 5).astype(np.float32)
        t = torch.nn.PReLU(5)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(a))
            ref = t(torch.from_numpy(x)).numpy()
        out = np.asarray(zr.prelu({"p.weight": jnp.asarray(a)}, "p",
                                  jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_depthwise_conv_in_convolution_module(self):
        """The conv module's depthwise conv == torch Conv1d(groups=C,
        padding=K//2)."""
        c, k, s = 6, 7, 12
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, c, s)).astype(np.float32)
        w = rng.standard_normal((c, 1, k)).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=k // 2, groups=c).numpy()
        from speech_diarization_tpu.models.layers import conv1d_torch

        out = np.asarray(conv1d_torch(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), padding=k // 2,
                                      groups=c))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_sp_conv_transpose2d(self):
        """MP-SENet SPConvTranspose2d semantics: freq pad (1,1), conv (1,3)
        with r*C outputs, sub-pixel interleave along frequency."""
        c, r = 4, 2
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, c, 5, 9)).astype(np.float32)
        w = rng.standard_normal((c * r, c, 1, 3)).astype(np.float32)
        b = rng.standard_normal(c * r).astype(np.float32)

        xt = torch.nn.functional.pad(torch.from_numpy(x), (1, 1, 0, 0))
        out_t = torch.nn.functional.conv2d(
            xt, torch.from_numpy(w), torch.from_numpy(b))
        bsz, rc, h, wd = out_t.shape
        out_t = out_t.view(bsz, r, rc // r, h, wd).permute(0, 2, 3, 4, 1)
        ref = out_t.contiguous().view(bsz, rc // r, h, -1).numpy()

        p = {"sp.conv.weight": jnp.asarray(w), "sp.conv.bias": jnp.asarray(b)}
        out = np.asarray(zr.sp_conv_transpose2d(p, "sp", jnp.asarray(x), r=r))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_dense_block_against_torch_mirror(self):
        """Dense block (dilated causal-time 3x3 convs + channel dense
        concat) vs a torch mirror of MP-SENet's DenseBlock."""
        c, depth = 4, 4
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, c, 6, 9)).astype(np.float32)

        p = {}
        tl = []
        for i in range(depth):
            dil = 2 ** i
            w = (rng.standard_normal((c, c * (i + 1), 3, 3)) * 0.2).astype(np.float32)
            b = rng.standard_normal(c).astype(np.float32)
            g = rng.uniform(0.5, 1.5, c).astype(np.float32)
            beta = rng.standard_normal(c).astype(np.float32)
            a = rng.uniform(0.1, 0.4, c).astype(np.float32)
            p[f"d.dense_conv_{i+1}.1.weight"] = jnp.asarray(w)
            p[f"d.dense_conv_{i+1}.1.bias"] = jnp.asarray(b)
            p[f"d.dense_conv_{i+1}.2.weight"] = jnp.asarray(g)
            p[f"d.dense_conv_{i+1}.2.bias"] = jnp.asarray(beta)
            p[f"d.dense_conv_{i+1}.3.weight"] = jnp.asarray(a)
            conv = torch.nn.Conv2d(c * (i + 1), c, 3, dilation=(dil, 1))
            norm = torch.nn.InstanceNorm2d(c, affine=True)
            act = torch.nn.PReLU(c)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(w))
                conv.bias.copy_(torch.from_numpy(b))
                norm.weight.copy_(torch.from_numpy(g))
                norm.bias.copy_(torch.from_numpy(beta))
                act.weight.copy_(torch.from_numpy(a))
            tl.append((dil, conv, norm, act))

        with torch.no_grad():
            skip = torch.from_numpy(x)
            for dil, conv, norm, act in tl:
                h = torch.nn.functional.pad(skip, (1, 1, 2 * dil, 0))
                h = act(norm(conv(h)))
                out_ref = h
                skip = torch.cat([h, skip], dim=1)
            ref = out_ref.numpy()

        out = np.asarray(zr.dense_block(p, "d", jnp.asarray(x), depth=depth))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_rel_shift_brute_force(self):
        """rel_shift picks pos_scores[..., q, (k - q) + (T-1)]."""
        n, h, t = 1, 2, 5
        rng = np.random.default_rng(5)
        scores = rng.standard_normal((n, h, t, 2 * t - 1)).astype(np.float32)
        out = np.asarray(zr.rel_shift(jnp.asarray(scores), t))
        for q in range(t):
            for k in range(t):
                np.testing.assert_allclose(
                    out[:, :, q, k], scores[:, :, q, (k - q) + t - 1])

    def test_bias_norm(self):
        """BiasNorm: x / rms(x - bias) * exp(log_scale) (icefall)."""
        rng = np.random.default_rng(6)
        x = rng.standard_normal((3, 4, 8)).astype(np.float32)
        bias = rng.standard_normal(8).astype(np.float32)
        ls = np.float32(0.3)
        ref = x * (np.exp(ls) / np.sqrt(
            np.mean((x - bias) ** 2, axis=-1, keepdims=True) + 1e-12))
        p = {"n.bias": jnp.asarray(bias), "n.log_scale": jnp.asarray(ls)}
        out = np.asarray(zr.bias_norm(p, "n", jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_swoosh_values(self):
        """SwooshL(0) ≈ 0.0168, SwooshR(0) ≈ 0.0 (icefall scaling.py
        constants chose the -0.313261687 offset to zero SwooshR at 0)."""
        assert abs(float(zr.swoosh_l(jnp.zeros(())))
                   - (np.log1p(np.exp(-4.0)) - 0.035)) < 1e-6
        assert abs(float(zr.swoosh_r(jnp.zeros(())))) < 1e-6


class TestWindowedIntegration:
    def test_windowed_enhance_with_ref_model(self, tiny):
        """The faithful graph slots into the reference-style 2 s windowed
        OLA runner (``/root/reference/zipenhancex.py:15-63`` semantics)."""
        from speech_diarization_tpu.pipelines.enhance import windowed_enhance

        m, p = tiny
        sr = m.sample_rate
        rng = np.random.default_rng(7)
        wav = (rng.standard_normal(int(2.7 * sr)) * 0.1).astype(np.float32)
        fn = jax.jit(lambda w: m.apply(p, w))
        out = windowed_enhance(fn, wav, sr, window_s=1.0, batch_size=4)
        assert out.shape == wav.shape
        assert np.isfinite(out).all()
