"""Golden numeric parity: our JAX ERes2NetV2 vs a 3D-Speaker-faithful torch
oracle, through the real checkpoint mapping.

The reference runs this model as an ONNX black box (`speech_encode.py:42-60`).
The artifact cannot be downloaded here (zero egress), so this file
reconstructs the 3D-Speaker `ERes2NetV2` module graph faithfully in torch —
same block structure (BasicBlockERes2NetV2 / AFF variant), same state_dict
key names — random-initializes it, ports the state_dict through
`models/eres2netv2.load_eres2netv2`, and asserts output parity.
`SDTPU_ERES2NETV2_CKPT=<path.onnx|path.pt>` runs the load path against the
real artifact when available.
"""
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from speech_diarization_tpu.models.eres2netv2 import ERes2NetV2, load_eres2netv2


class AFF(nn.Module):
    def __init__(self, channels, r=4):
        super().__init__()
        inter = channels // r
        self.local_att = nn.Sequential(
            nn.Conv2d(channels * 2, inter, kernel_size=1),
            nn.BatchNorm2d(inter),
            nn.SiLU(inplace=True),
            nn.Conv2d(inter, channels, kernel_size=1),
            nn.BatchNorm2d(channels),
        )

    def forward(self, x, ds_y):
        att = 1.0 + torch.tanh(self.local_att(torch.cat((x, ds_y), dim=1)))
        return x * att + ds_y * (2.0 - att)


class BasicBlockERes2NetV2(nn.Module):
    fuse = False

    def __init__(self, expansion, in_planes, planes, stride, base_width, scale):
        super().__init__()
        self.expansion, self.scale = expansion, scale
        width = int(math.floor(planes * (base_width / 64.0)))
        self.width = width
        self.conv1 = nn.Conv2d(in_planes, width * scale, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(width * scale)
        self.convs = nn.ModuleList(
            nn.Conv2d(width, width, 3, padding=1, bias=False) for _ in range(scale))
        self.bns = nn.ModuleList(nn.BatchNorm2d(width) for _ in range(scale))
        if self.fuse:
            self.fuse_models = nn.ModuleList(AFF(width) for _ in range(scale - 1))
        self.conv3 = nn.Conv2d(width * scale, planes * expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * expansion)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != expansion * planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, expansion * planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(expansion * planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        spx = torch.split(out, self.width, 1)
        outs = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = spx[i]
            elif self.fuse:
                sp = self.fuse_models[i - 1](sp, spx[i])
            else:
                sp = sp + spx[i]
            sp = F.relu(self.bns[i](self.convs[i](sp)))
            outs.append(sp)
        out = self.bn3(self.conv3(torch.cat(outs, 1)))
        return F.relu(out + self.shortcut(x))


class BasicBlockERes2NetV2AFF(BasicBlockERes2NetV2):
    fuse = True


class TorchERes2NetV2(nn.Module):
    """3D-Speaker ERes2NetV2 (state_dict-key faithful)."""

    def __init__(self, feat_dim=80, m_channels=32, base_width=24, scale=4,
                 expansion=4, num_blocks=(3, 4, 6, 3), emb_dim=192):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.in_planes = m_channels
        args = dict(base_width=base_width, scale=scale)

        def make_layer(block, planes, n, stride):
            layers = []
            for s in [stride] + [1] * (n - 1):
                layers.append(block(expansion, self.in_planes, planes, s, **args))
                self.in_planes = planes * expansion
            return nn.Sequential(*layers)

        self.layer1 = make_layer(BasicBlockERes2NetV2, m_channels, num_blocks[0], 1)
        self.layer2 = make_layer(BasicBlockERes2NetV2, m_channels * 2, num_blocks[1], 2)
        self.layer3 = make_layer(BasicBlockERes2NetV2AFF, m_channels * 4, num_blocks[2], 2)
        self.layer4 = make_layer(BasicBlockERes2NetV2AFF, m_channels * 8, num_blocks[3], 2)
        c3, c4 = m_channels * 4 * expansion, m_channels * 8 * expansion
        self.layer3_ds = nn.Conv2d(c3, c4, 3, padding=1, stride=2, bias=False)
        self.fuse34 = AFF(c4)
        self.seg_1 = nn.Linear(c4 * (feat_dim // 8) * 2, emb_dim)

    def forward(self, feats):  # [B, T, F]
        x = feats.permute(0, 2, 1).unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out1 = self.layer1(out)
        out2 = self.layer2(out1)
        out3 = self.layer3(out2)
        out4 = self.layer4(out3)
        out3_ds = self.layer3_ds(out3)
        fused = self.fuse34(out4, out3_ds)
        b, c, f, t = fused.shape
        h = fused.reshape(b, c * f, t)
        stats = torch.cat(
            [h.mean(dim=2), torch.sqrt(h.var(dim=2, unbiased=True) + 1e-7)], dim=1)
        return self.seg_1(stats)


CFG = dict(n_mels=32, m_channels=8, base_width=16, scale=2, expansion=2,
           num_blocks=(1, 1, 2, 1), emb_dim=32)
TCFG = dict(feat_dim=32, m_channels=8, base_width=16, scale=2, expansion=2,
            num_blocks=(1, 1, 2, 1), emb_dim=32)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = TorchERes2NetV2(**TCFG)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return model.eval()


class TestMapping:
    def test_oracle_state_dict_matches_manifest(self, oracle):
        net = ERes2NetV2(**CFG)
        man = net.manifest()
        sd = {k: tuple(v.shape) for k, v in oracle.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        assert sd == man

    def test_full_size_manifest(self):
        man = ERes2NetV2().manifest()  # w24s4ep4 defaults
        assert man["conv1.weight"] == (32, 1, 3, 3)
        assert man["layer1.0.conv1.weight"] == (48, 32, 1, 1)   # width 12 * scale 4
        assert man["layer4.0.conv3.weight"] == (1024, 384, 1, 1)
        assert man["layer3_ds.weight"] == (1024, 512, 3, 3)
        assert man["seg_1.weight"] == (192, 1024 * 10 * 2)
        n_params = sum(int(np.prod(s)) for s in man.values())
        assert 10e6 < n_params < 30e6  # w24s4ep4 is a ~18M-param model

    def test_strict_rejects_wrong_schema(self, oracle):
        sd = dict(oracle.state_dict())
        sd.pop("seg_1.bias")
        with pytest.raises(ValueError, match="schema mismatch"):
            load_eres2netv2(sd, ERes2NetV2(**CFG))


class TestForwardParity:
    @pytest.mark.parametrize("shape", [(2, 40, 32), (1, 99, 32)])
    def test_embedding_parity(self, oracle, shape):
        net = ERes2NetV2(**CFG)
        params = load_eres2netv2(oracle.state_dict(), net)
        g = np.random.default_rng(0)
        feats = g.standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feats)).numpy()
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(
    not os.environ.get("SDTPU_ERES2NETV2_CKPT"),
    reason="set SDTPU_ERES2NETV2_CKPT=<model.onnx|ckpt> to test the real artifact",
)
class TestRealArtifact:
    def test_loads_and_embeds(self):
        net = ERes2NetV2()
        params = load_eres2netv2(os.environ["SDTPU_ERES2NETV2_CKPT"], net)
        g = np.random.default_rng(0)
        feats = g.standard_normal((2, 100, 80)).astype(np.float32)
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == (2, 192) and np.isfinite(out).all()
