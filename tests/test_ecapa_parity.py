"""Golden numeric parity: our JAX ECAPA-TDNN vs a SpeechBrain-faithful torch
oracle, through the real checkpoint mapping.

The reference consumes ECAPA through SpeechBrain (`speech_encode.py:64-78`).
The actual pretrained artifact cannot be downloaded here (zero egress), so
this file reconstructs `speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN`
faithfully in torch — same module graph, same state_dict key names, reflect
"same" padding, activation-before-BatchNorm TDNN blocks, eps=1e-12 attentive
pooling — random-initializes it, ports its state_dict through
`models/port_ecapa.load_ecapa_speechbrain`, and asserts output parity.
When the real `embedding_model.ckpt` lands, `SDTPU_ECAPA_CKPT=<path>`
runs the same load path against it.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from speech_diarization_tpu.models.ecapa import EcapaTdnn
from speech_diarization_tpu.models.port_ecapa import (
    ecapa_speechbrain_key_map,
    ecapa_torch_manifest,
    load_ecapa_speechbrain,
)


# --------------------------------------------------------------------------
# torch oracle: SpeechBrain module graph with identical state_dict keys
# --------------------------------------------------------------------------
class SBConv1d(nn.Module):
    """speechbrain.nnet.CNN.Conv1d: reflect 'same' padding, inner .conv."""

    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.k, self.dilation = k, dilation
        self.conv = nn.Conv1d(in_ch, out_ch, k, dilation=dilation)

    def forward(self, x):
        pad = (self.k - 1) * self.dilation // 2
        if pad > 0:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm1d(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = nn.BatchNorm1d(ch)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(nn.Module):
    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = SBConv1d(in_ch, out_ch, k, dilation)
        self.activation = nn.ReLU()
        self.norm = SBBatchNorm1d(out_ch)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class Res2NetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, scale, k, dilation):
        super().__init__()
        self.scale = scale
        self.blocks = nn.ModuleList(
            TDNNBlock(in_ch // scale, out_ch // scale, k, dilation)
            for _ in range(scale - 1)
        )

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SEBlock(nn.Module):
    def __init__(self, in_ch, se_ch, out_ch):
        super().__init__()
        self.conv1 = SBConv1d(in_ch, se_ch, 1)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = SBConv1d(se_ch, out_ch, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = self.relu(self.conv1(s))
        s = self.sigmoid(self.conv2(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    def __init__(self, channels, attention_channels):
        super().__init__()
        self.eps = 1e-12
        self.tdnn = TDNNBlock(channels * 3, attention_channels, 1, 1)
        self.tanh = nn.Tanh()
        self.conv = SBConv1d(attention_channels, channels, 1)

    def forward(self, x):
        L = x.shape[-1]

        def stats(x, m):
            mean = (m * x).sum(2)
            std = torch.sqrt((m * (x - mean.unsqueeze(2)).pow(2)).sum(2).clamp(self.eps))
            return mean, std

        mean, std = stats(x, 1.0 / L)
        attn = torch.cat(
            [x, mean.unsqueeze(2).repeat(1, 1, L), std.unsqueeze(2).repeat(1, 1, L)],
            dim=1,
        )
        attn = self.conv(self.tanh(self.tdnn(attn)))
        attn = F.softmax(attn, dim=2)
        mean, std = stats(x, attn)
        return torch.cat((mean, std), dim=1).unsqueeze(2)


class SERes2NetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(in_ch, out_ch, 1, 1)
        self.res2net_block = Res2NetBlock(out_ch, out_ch, scale, k, dilation)
        self.tdnn2 = TDNNBlock(out_ch, out_ch, 1, 1)
        self.se_block = SEBlock(out_ch, se_ch, out_ch)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


class SBEcapa(nn.Module):
    """speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN (uniform channels)."""

    def __init__(self, n_mels, channels, emb_dim, scale, se_ch, att_ch,
                 dilations=(2, 3, 4)):
        super().__init__()
        self.blocks = nn.ModuleList([TDNNBlock(n_mels, channels, 5, 1)])
        for d in dilations:
            self.blocks.append(
                SERes2NetBlock(channels, channels, scale, se_ch, 3, d))
        cc = channels * len(dilations)
        self.mfa = TDNNBlock(cc, cc, 1, 1)
        self.asp = AttentiveStatisticsPooling(cc, att_ch)
        self.asp_bn = SBBatchNorm1d(2 * cc)
        self.fc = SBConv1d(2 * cc, emb_dim, 1)

    def forward(self, feats):  # feats [B, T, n_mels]
        x = feats.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        x = self.asp(x)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.squeeze(2)


CFG = dict(n_mels=24, channels=64, emb_dim=32, scale=4, se_channels=16,
           att_channels=16)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = SBEcapa(CFG["n_mels"], CFG["channels"], CFG["emb_dim"],
                    CFG["scale"], CFG["se_channels"], CFG["att_channels"])
    # randomize BN running stats so inference-mode parity is non-trivial
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return model.eval()


class TestMapping:
    def test_key_map_covers_manifest_exactly(self):
        net = EcapaTdnn(**CFG)
        assert set(ecapa_speechbrain_key_map(net)) == set(ecapa_torch_manifest(net))

    def test_default_manifest_is_full_size(self):
        man = ecapa_torch_manifest(EcapaTdnn())
        assert man["blocks.0.conv.conv.weight"] == (512, 80, 5)
        assert man["mfa.conv.conv.weight"] == (1536, 1536, 1)
        assert man["fc.conv.weight"] == (192, 3072, 1)
        assert man["asp.tdnn.conv.conv.weight"] == (128, 4608, 1)

    def test_oracle_state_dict_matches_manifest(self, oracle):
        net = EcapaTdnn(**CFG)
        man = ecapa_torch_manifest(net)
        sd = {k: tuple(v.shape) for k, v in oracle.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        assert sd == man

    def test_ported_tree_matches_init_tree(self, oracle):
        import jax
        from jax.tree_util import tree_structure, tree_map

        net = EcapaTdnn(**CFG)
        ours = net.init(jax.random.PRNGKey(0))
        ported = load_ecapa_speechbrain(oracle.state_dict(), net)
        assert tree_structure(ours) == tree_structure(ported)
        shapes_ok = tree_map(lambda a, b: a.shape == b.shape, ours, ported)
        import jax.tree_util as jtu

        assert all(jtu.tree_leaves(shapes_ok))

    def test_strict_rejects_wrong_schema(self, oracle):
        sd = dict(oracle.state_dict())
        sd.pop("fc.conv.bias")
        sd["bogus.key"] = torch.zeros(3)
        with pytest.raises(ValueError, match="schema mismatch"):
            load_ecapa_speechbrain(sd, EcapaTdnn(**CFG))


class TestForwardParity:
    def test_embedding_parity(self, oracle):
        net = EcapaTdnn(**CFG)
        params = load_ecapa_speechbrain(oracle.state_dict(), net)
        g = np.random.default_rng(0)
        feats = g.standard_normal((3, 50, CFG["n_mels"])).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feats)).numpy()
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_parity_longer_sequence(self, oracle):
        net = EcapaTdnn(**CFG)
        params = load_ecapa_speechbrain(oracle.state_dict(), net)
        g = np.random.default_rng(1)
        feats = g.standard_normal((2, 200, CFG["n_mels"])).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feats)).numpy()
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(
    not os.environ.get("SDTPU_ECAPA_CKPT"),
    reason="set SDTPU_ECAPA_CKPT=<embedding_model.ckpt> to test the real artifact",
)
class TestRealArtifact:
    def test_loads_and_embeds(self):
        net = EcapaTdnn()
        params = load_ecapa_speechbrain(os.environ["SDTPU_ECAPA_CKPT"], net)
        g = np.random.default_rng(0)
        feats = g.standard_normal((2, 100, 80)).astype(np.float32)
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == (2, 192) and np.isfinite(out).all()
