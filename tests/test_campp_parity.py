"""Golden numeric parity: our JAX CAM++ vs a 3D-Speaker-faithful torch oracle,
through the real checkpoint mapping (see tests/test_ecapa_parity.py for the
strategy — zero egress, so the oracle reconstructs the published module graph
with identical state_dict keys).  `SDTPU_CAMPP_CKPT=<path>` tests the real
ModelScope artifact when available."""
import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from speech_diarization_tpu.models.campp import CamPlusPlus, load_campp


def get_nonlinear(config_str, channels):
    nl = nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            nl.add_module("relu", nn.ReLU(inplace=True))
        elif name == "batchnorm":
            nl.add_module("batchnorm", nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            nl.add_module("batchnorm", nn.BatchNorm1d(channels, affine=False))
    return nl


class BasicResBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=(stride, 1),
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=(stride, 1), bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class FCM(nn.Module):
    def __init__(self, m_channels=32, feat_dim=80):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.layer2 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.conv2 = nn.Conv2d(m_channels, m_channels, 3, stride=(2, 1),
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)

    def forward(self, x):  # [B, F, T]
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        s = out.shape
        return out.reshape(s[0], s[1] * s[2], s[3])


class TDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1):
        super().__init__()
        pad = (k - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_ch, out_ch, k, stride=stride, padding=pad,
                                dilation=dilation)
        self.nonlinear = get_nonlinear("batchnorm-relu", out_ch)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(nn.Module):
    def __init__(self, bn_ch, out_ch, k, dilation, seg_len=100, reduction=2):
        super().__init__()
        pad = (k - 1) // 2 * dilation
        self.seg_len = seg_len
        self.linear_local = nn.Conv1d(bn_ch, out_ch, k, padding=pad,
                                      dilation=dilation, bias=False)
        self.linear1 = nn.Conv1d(bn_ch, bn_ch // reduction, 1)
        self.relu = nn.ReLU(inplace=True)
        self.linear2 = nn.Conv1d(bn_ch // reduction, out_ch, 1)
        self.sigmoid = nn.Sigmoid()

    def seg_pooling(self, x):
        seg = F.avg_pool1d(x, kernel_size=self.seg_len, stride=self.seg_len,
                           ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, self.seg_len).reshape(*shape[:-1], -1)
        return seg[..., : x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = self.relu(self.linear1(context))
        m = self.sigmoid(self.linear2(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, bn_ch, k, dilation):
        super().__init__()
        self.nonlinear1 = get_nonlinear("batchnorm-relu", in_ch)
        self.linear1 = nn.Conv1d(in_ch, bn_ch, 1, bias=False)
        self.nonlinear2 = get_nonlinear("batchnorm-relu", bn_ch)
        self.cam_layer = CAMLayer(bn_ch, out_ch, k, dilation)

    def forward(self, x):
        return self.cam_layer(self.nonlinear2(self.linear1(self.nonlinear1(x))))


class CAMDenseTDNNBlock(nn.ModuleList):
    def __init__(self, num_layers, in_ch, out_ch, bn_ch, k, dilation):
        super().__init__()
        for i in range(num_layers):
            self.add_module(
                f"tdnnd{i + 1}",
                CAMDenseTDNNLayer(in_ch + i * out_ch, out_ch, bn_ch, k, dilation))

    def forward(self, x):
        for layer in self.children():
            x = torch.cat([x, layer(x)], dim=1)
        return x


class TransitLayer(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.nonlinear = get_nonlinear("batchnorm-relu", in_ch)
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=False)
        self.nonlinear = get_nonlinear("batchnorm_", out_ch)

    def forward(self, x):
        if x.dim() == 2:
            return self.nonlinear(self.linear(x.unsqueeze(-1)).squeeze(-1))
        return self.nonlinear(self.linear(x))


class StatsPool(nn.Module):
    def forward(self, x):
        return torch.cat([x.mean(-1), x.std(-1, unbiased=True)], dim=-1)


class TorchCAMPPlus(nn.Module):
    def __init__(self, feat_dim=80, m_channels=32, init_channels=128, growth=32,
                 bn_ch=128, num_layers=(12, 24, 16), dilations=(1, 2, 2),
                 kernels=(3, 3, 3), emb_dim=192):
        super().__init__()
        self.head = FCM(m_channels, feat_dim)
        channels = m_channels * (feat_dim // 8)
        from collections import OrderedDict

        self.xvector = nn.Sequential(OrderedDict([
            ("tdnn", TDNNLayer(channels, init_channels, 5, stride=2)),
        ]))
        channels = init_channels
        for i, (n, k, d) in enumerate(zip(num_layers, kernels, dilations)):
            self.xvector.add_module(
                f"block{i + 1}", CAMDenseTDNNBlock(n, channels, growth, bn_ch, k, d))
            channels += n * growth
            self.xvector.add_module(f"transit{i + 1}", TransitLayer(channels, channels // 2))
            channels //= 2
        self.xvector.add_module("out_nonlinear", get_nonlinear("batchnorm-relu", channels))
        self.xvector.add_module("stats", StatsPool())
        self.xvector.add_module("dense", DenseLayer(channels * 2, emb_dim))

    def forward(self, feats):  # [B, T, F]
        x = feats.permute(0, 2, 1)
        x = self.head(x)
        return self.xvector(x)


CFG = dict(n_mels=32, m_channels=8, init_channels=32, growth=8, bn_channels=16,
           num_layers=(2, 3, 2), dilations=(1, 2, 2), kernels=(3, 3, 3), emb_dim=24)
TCFG = dict(feat_dim=32, m_channels=8, init_channels=32, growth=8, bn_ch=16,
            num_layers=(2, 3, 2), dilations=(1, 2, 2), kernels=(3, 3, 3), emb_dim=24)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = TorchCAMPPlus(**TCFG)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d)):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return model.eval()


class TestMapping:
    def test_oracle_state_dict_matches_manifest(self, oracle):
        net = CamPlusPlus(**CFG)
        man = net.manifest()
        sd = {k: tuple(v.shape) for k, v in oracle.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        assert sd == man

    def test_full_size_param_count(self):
        # the published iic/speech_campplus_sv_zh-cn_16k-common is ~7.2M params
        man = CamPlusPlus().manifest()
        n = sum(int(np.prod(s)) for k, s in man.items() if "running" not in k)
        assert 6.5e6 < n < 8.0e6, n / 1e6

    def test_strict_rejects_wrong_schema(self, oracle):
        sd = dict(oracle.state_dict())
        sd.pop("head.conv1.weight")
        with pytest.raises(ValueError, match="schema mismatch"):
            load_campp(sd, CamPlusPlus(**CFG))


class TestForwardParity:
    @pytest.mark.parametrize("shape", [(2, 64, 32), (1, 317, 32)])
    def test_embedding_parity(self, oracle, shape):
        # 317 frames: after the stride-2 tdnn, exercises the ragged tail of
        # the 100-frame CAM segment pooling
        net = CamPlusPlus(**CFG)
        params = load_campp(oracle.state_dict(), net)
        g = np.random.default_rng(0)
        feats = g.standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feats)).numpy()
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(
    not os.environ.get("SDTPU_CAMPP_CKPT"),
    reason="set SDTPU_CAMPP_CKPT=<campplus ckpt/onnx> to test the real artifact",
)
class TestRealArtifact:
    def test_loads_and_embeds(self):
        net = CamPlusPlus()
        params = load_campp(os.environ["SDTPU_CAMPP_CKPT"], net)
        g = np.random.default_rng(0)
        feats = g.standard_normal((2, 100, 80)).astype(np.float32)
        out = np.asarray(net.apply(params, jnp.asarray(feats)))
        assert out.shape == (2, 192) and np.isfinite(out).all()
