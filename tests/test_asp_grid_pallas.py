"""Parity: fused Pallas sliding-grid ASP head vs the decomposed jnp path.

The kernel (ops/pallas/asp_grid.py) must reproduce EcapaTdnn.asp_head_grid
— SpeechBrain AttentiveStatisticsPooling semantics over the streaming grid
(reference consumer: speech_encode.py:64-78) — while keeping the per-window
attention chain in VMEM.  Interpret mode on CPU; the on-chip compiled path
is exercised by the bench/driver (SDTPU_ASP_BACKEND=pallas is the device
default in EcapaModel.encode_grid_chunk).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_diarization_tpu.models.ecapa import EcapaTdnn
from speech_diarization_tpu.ops.pallas.asp_grid import asp_grid_stats


def _tiny_net():
    # small dims keep interpret-mode runtime reasonable; cc=48 / a=8 also
    # exercise the kernel's pad-to-128 lane handling
    net = EcapaTdnn(n_mels=8, channels=16, scale=4, se_channels=8,
                    att_channels=8, emb_dim=12, dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0))
    # non-trivial inference BN stats so the folded scale/shift is exercised
    a = net.att_channels
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params["att_bn"] = {
        "gamma": 1.0 + 0.1 * jax.random.normal(k1, (a,)),
        "beta": 0.1 * jax.random.normal(k2, (a,)),
        "mean": 0.05 * jnp.arange(a, dtype=jnp.float32),
        "var": 1.0 + 0.02 * jnp.arange(a, dtype=jnp.float32),
    }
    return net, params


@pytest.mark.parametrize(
    "first_f,hop_f,win_f,n_windows",
    [
        (0, 4, 17, 10),   # n_windows not a multiple of the window block
        (8, 4, 17, 16),   # nonzero grid offset, exact blocks
        (3, 6, 21, 5),    # hop needing a larger block for 16-alignment
    ],
)
def test_asp_grid_pallas_matches_decomposed(first_f, hop_f, win_f, n_windows):
    net, params = _tiny_net()
    cc = net.cat_channels
    t_f = first_f + (n_windows - 1) * hop_f + win_f + 3
    x = jax.random.normal(jax.random.PRNGKey(1), (cc, t_f), jnp.float32)

    ref = np.asarray(
        net.asp_head_grid(params, x, first_f, hop_f, win_f, n_windows),
        np.float64)
    out = np.asarray(
        net.asp_head_grid_pallas(params, x, first_f, hop_f, win_f, n_windows,
                                 interpret=True),
        np.float64)
    assert out.shape == ref.shape == (n_windows, net.emb_dim)
    cos = (ref * out).sum(1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1) + 1e-30)
    # kernel computes matmuls in bf16 (as the production bf16 net does);
    # embedding direction must be preserved to ~1e-3
    assert cos.min() > 0.9999, cos.min()
    rel = np.linalg.norm(ref - out) / np.linalg.norm(ref)
    assert rel < 5e-3, rel


def test_asp_grid_stats_masked_softmax_ignores_out_of_window():
    """Rows outside [start, start+win_f) must not leak into the stats: a
    huge spike planted just past each window's end leaves mu/sd unchanged."""
    net, params = _tiny_net()
    cc = net.cat_channels
    first_f, hop_f, win_f, n_w = 0, 4, 9, 6
    t_f = first_f + (n_w - 1) * hop_f + win_f + 8
    x = jax.random.normal(jax.random.PRNGKey(2), (cc, t_f), jnp.float32)

    def stats_of(xa):
        eps = 1e-12
        x32 = xa.astype(jnp.float32)
        starts = first_f + hop_f * np.arange(n_w)
        cs1 = jnp.pad(jnp.cumsum(x32, axis=-1), ((0, 0), (1, 0)))
        cs2 = jnp.pad(jnp.cumsum(x32 * x32, axis=-1), ((0, 0), (1, 0)))
        mu_g = (cs1[:, starts + win_f] - cs1[:, starts]).T / win_f
        sd_g = jnp.sqrt(jnp.clip(
            (cs2[:, starts + win_f] - cs2[:, starts]).T / win_f
            - mu_g * mu_g, eps))
        w1 = params["att_w1"][..., 0]
        w1x, w1m, w1s = w1[:, :cc], w1[:, cc:2 * cc], w1[:, 2 * cc:]
        bw = mu_g @ w1m.T + sd_g @ w1s.T + params["att_b1"]
        ab = params["att_bn"]
        inv = jax.lax.rsqrt(ab["var"] + 1e-5)
        s_bn = ab["gamma"] * inv
        t_bn = ab["beta"] - ab["mean"] * s_bn
        return np.asarray(asp_grid_stats(
            xa, bw, w1x, s_bn, t_bn, params["att_w2"][..., 0],
            params["att_b2"], first_f, hop_f, win_f, n_w, interpret=True))

    base = stats_of(x)
    # spike one frame past the LAST window's end (still inside t_f)
    spiked = x.at[:, first_f + (n_w - 1) * hop_f + win_f].set(50.0)
    out = stats_of(spiked)
    # windows whose span excludes the spiked frame must be bit-identical
    np.testing.assert_allclose(out[-1], base[-1], rtol=1e-5, atol=1e-5)
