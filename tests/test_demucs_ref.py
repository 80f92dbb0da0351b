"""Parity + schema tests for the reference-faithful HTDemucs graph.

The real MVSEP-CDX23 artifacts (``/root/reference/dialog-demix.py:9-28``)
are unavailable under zero egress, so — like ``test_zipenhancer_ref.py`` —
these tests pin the numerics of every primitive against torch oracles
assembled from the published demucs v4 semantics, validate the strict
loader round-trip, and env-gate a real-artifact test
(``SDTPU_DEMUCS_CKPT``)."""
from __future__ import annotations

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models import demucs_ref as M
from speech_diarization_tpu.models.demucs_ref import HTDemucsRef
from speech_diarization_tpu.models.port_demucs import load_htdemucs

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


class TestPrimitives:
    def test_conv_transpose1d(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 6, 17)).astype(np.float32)
        w = rng.standard_normal((6, 4, 8)).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)
        got = _np(M.conv_transpose1d_torch(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b), stride=4))
        want = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=4).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_transpose2d_freq(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 6, 9, 5)).astype(np.float32)
        w = rng.standard_normal((6, 4, 8, 1)).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)
        got = _np(M.conv_transpose2d_freq(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b), stride=4))
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=(4, 1)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_group_norm_1(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, 8, 21)).astype(np.float32)
        w = rng.standard_normal(8).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        p = {"g.weight": jnp.asarray(w), "g.bias": jnp.asarray(b)}
        got = _np(M.group_norm_1(p, "g", jnp.asarray(x)))
        want = torch.nn.functional.group_norm(
            torch.from_numpy(x), 1, torch.from_numpy(w),
            torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_multihead_attention(self):
        rng = np.random.default_rng(3)
        dim, heads = 32, 4
        mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        q = rng.standard_normal((2, 11, dim)).astype(np.float32)
        k = rng.standard_normal((2, 7, dim)).astype(np.float32)
        with torch.no_grad():
            want, _ = mha(torch.from_numpy(q), torch.from_numpy(k),
                          torch.from_numpy(k), need_weights=False)
        p = {
            "a.in_proj_weight": jnp.asarray(mha.in_proj_weight.detach().numpy()),
            "a.in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
            "a.out_proj.weight": jnp.asarray(mha.out_proj.weight.detach().numpy()),
            "a.out_proj.bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        }
        got = _np(M.multihead_attention(p, "a", jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(k), heads))
        np.testing.assert_allclose(got, want.numpy(), atol=1e-5)

    def test_dconv_block(self):
        """DConv residual stack vs a torch replica of the published module
        list (conv k3 dilated -> GN -> GELU -> conv1x1 -> GN -> GLU ->
        LayerScale, residual add)."""
        rng = np.random.default_rng(4)
        ch, comp, depth = 16, 8, 2
        hid = ch // comp
        x = rng.standard_normal((3, ch, 25)).astype(np.float32)

        p = {}
        tl = []
        for d in range(depth):
            dil = 2 ** d
            conv1 = torch.nn.Conv1d(ch, hid, 3, dilation=dil, padding=dil)
            gn1 = torch.nn.GroupNorm(1, hid)
            conv2 = torch.nn.Conv1d(hid, 2 * ch, 1)
            gn2 = torch.nn.GroupNorm(1, 2 * ch)
            scale = torch.nn.Parameter(torch.full((ch,), 1e-3))
            with torch.no_grad():
                gn1.weight.uniform_(0.5, 1.5); gn1.bias.uniform_(-0.5, 0.5)
                gn2.weight.uniform_(0.5, 1.5); gn2.bias.uniform_(-0.5, 0.5)
            tl.append((conv1, gn1, conv2, gn2, scale))
            pre = f"d.layers.{d}"
            p[f"{pre}.0.weight"] = jnp.asarray(conv1.weight.detach().numpy())
            p[f"{pre}.0.bias"] = jnp.asarray(conv1.bias.detach().numpy())
            p[f"{pre}.1.weight"] = jnp.asarray(gn1.weight.detach().numpy())
            p[f"{pre}.1.bias"] = jnp.asarray(gn1.bias.detach().numpy())
            p[f"{pre}.3.weight"] = jnp.asarray(conv2.weight.detach().numpy())
            p[f"{pre}.3.bias"] = jnp.asarray(conv2.bias.detach().numpy())
            p[f"{pre}.4.weight"] = jnp.asarray(gn2.weight.detach().numpy())
            p[f"{pre}.4.bias"] = jnp.asarray(gn2.bias.detach().numpy())
            p[f"{pre}.6.scale"] = jnp.asarray(scale.detach().numpy())

        with torch.no_grad():
            xt = torch.from_numpy(x)
            for conv1, gn1, conv2, gn2, scale in tl:
                h = conv1(xt)
                h = torch.nn.functional.gelu(gn1(h))
                h = gn2(conv2(h))
                h = torch.nn.functional.glu(h, dim=1)
                xt = xt + scale[None, :, None] * h
        got = _np(M.dconv(p, "d", jnp.asarray(x), depth=depth))
        np.testing.assert_allclose(got, xt.numpy(), atol=1e-4)

    def test_spec_matches_torch_stft(self):
        """_spec vs the demucs recipe run with torch.stft (normalized Hann,
        center reflect, last bin dropped, 2 edge frames trimmed)."""
        rng = np.random.default_rng(5)
        nfft, hop = 512, 128
        t = 3000
        x = rng.standard_normal((1, 2, t)).astype(np.float32)

        le = int(math.ceil(t / hop))
        pad = hop // 2 * 3
        xt = torch.nn.functional.pad(
            torch.from_numpy(x), (pad, pad + le * hop - t), mode="reflect")
        z = torch.stft(xt.reshape(-1, xt.shape[-1]), nfft, hop,
                       window=torch.hann_window(nfft), win_length=nfft,
                       normalized=True, center=True, return_complex=True,
                       pad_mode="reflect")
        z = z.view(1, 2, *z.shape[-2:])[..., :-1, :][..., 2:2 + le]

        got = _np(M._spec(jnp.asarray(x), nfft, hop))
        np.testing.assert_allclose(got.real, z.real.numpy(), atol=2e-4)
        np.testing.assert_allclose(got.imag, z.imag.numpy(), atol=2e-4)

    def test_spec_ispec_roundtrip(self):
        """Band-limited signal (audio-like): the demucs recipe drops the
        Nyquist bin, so white noise loses ~1/(F+1) of its energy by design;
        for band-limited content the round trip is near-exact away from the
        first/last hop (thin OLA coverage at the extreme edges)."""
        rng = np.random.default_rng(6)
        nfft, hop = 512, 128
        t = 2500
        # brownian noise = strongly low-passed
        x = np.cumsum(rng.standard_normal((1, 2, t)), axis=-1).astype(np.float32)
        x /= np.abs(x).max()
        z = M._spec(jnp.asarray(x), nfft, hop)
        y = _np(M._ispec(z, t, nfft, hop))
        core = slice(hop, t - hop)
        np.testing.assert_allclose(y[..., core], x[..., core], atol=5e-3)

    def test_sin_embeddings_match_torch_formula(self):
        dim, h, w = 16, 5, 7
        pe = _np(M.create_2d_sin_embedding(dim, h, w))
        half = dim // 2
        div = np.exp(np.arange(0, half, 2) * -(math.log(10000.0) / half))
        want_sw = np.sin(np.arange(w)[:, None] * div)  # [W, half/2]
        np.testing.assert_allclose(pe[0, 0, 0, :], want_sw[:, 0], atol=1e-6)
        want_sh = np.sin(np.arange(h)[:, None] * div)
        np.testing.assert_allclose(pe[0, half, :, 0], want_sh[:, 0], atol=1e-6)
        e1 = _np(M.create_sin_embedding(6, 8))
        pos = np.arange(6)[:, None]
        phase = pos / (10000.0 ** (np.arange(4)[None, :] / 3.0))
        np.testing.assert_allclose(e1, np.concatenate(
            [np.cos(phase), np.sin(phase)], -1), atol=1e-6)


class TestGraph:
    @pytest.fixture(scope="class")
    def tiny(self):
        """A tiny config that keeps the full topology (4 layers would need
        F=2048; use nfft 512 -> F 256 -> 4 after 3 stride-4 layers)."""
        return HTDemucsRef(sources=("music", "effect", "dialog"),
                           channels=8, depth=3, nfft=512,
                           bottom_channels=16, t_layers=3, t_heads=2)

    def test_forward_shape(self, tiny):
        p = tiny.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 2, 4000)).astype(np.float32))
        y = jax.jit(tiny.apply)(p, x)
        assert y.shape == (1, 3, 2, 4000)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_loader_roundtrip(self, tiny):
        p = tiny.init(jax.random.PRNGKey(1))
        state = {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        ckpt = {"klass": None, "args": (), "kwargs": {}, "state": state}
        model, p2 = load_htdemucs(ckpt, model=tiny)
        assert set(p2) == set(p)
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(p2[k]))

    def test_loader_strictness(self, tiny):
        p = tiny.init(jax.random.PRNGKey(2))
        state = {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        state.pop("freq_emb.embedding.weight")
        with pytest.raises(ValueError, match="missing"):
            load_htdemucs({"state": state}, model=tiny)
        state["freq_emb.embedding.weight"] = torch.zeros(3, 3)
        with pytest.raises(ValueError, match="shape"):
            load_htdemucs({"state": state}, model=tiny)

    def test_default_param_count_matches_htdemucs(self):
        """The released htdemucs family is ~41-42M params; a config or key
        mistake in the manifest shows up as a big count drift."""
        n = HTDemucsRef().param_count()
        assert 38e6 < n < 46e6, n

    def test_kwargs_reconstruction(self):
        from speech_diarization_tpu.models.port_demucs import model_from_kwargs

        m = model_from_kwargs({"sources": ["music", "effect", "dialog"],
                               "channels": 24, "nfft": 2048,
                               "bottom_channels": 256, "t_layers": 3,
                               "lr": 1e-4, "some_training_flag": True})
        assert m.channels == 24 and m.nfft == 2048
        assert m.sources == ("music", "effect", "dialog")
        assert m.bottom == 256 and m.t_layers == 3


@pytest.mark.skipif("SDTPU_DEMUCS_CKPT" not in os.environ,
                    reason="real MVSEP .th artifact not available (zero egress)")
def test_real_artifact_loads():
    model, params = load_htdemucs(os.environ["SDTPU_DEMUCS_CKPT"])
    x = jnp.zeros((1, model.ac, int(0.5 * model.samplerate)), jnp.float32)
    y = model.apply(params, x)
    assert y.shape[1] == len(model.sources)
