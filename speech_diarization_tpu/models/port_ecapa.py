"""SpeechBrain ECAPA-TDNN checkpoint → JAX parameter mapping.

The reference loads ECAPA through SpeechBrain's ``EncoderClassifier``
(``speech_encode.py:64-70``: ``LanceaKing/spkrec-ecapa-cnceleb``;
``diar_diag.py:135-138``: ``speechbrain/spkrec-ecapa-voxceleb``).  The
artifact of interest is the bundle's ``embedding_model.ckpt`` — a plain torch
state_dict of ``speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN``.

This module is the declarative key map between that state_dict schema and
:class:`~speech_diarization_tpu.models.ecapa.EcapaTdnn`'s parameter tree,
plus a shape manifest so the mapping is testable without the artifact
(zero-egress): ``tests/test_ecapa_parity.py`` builds a faithful torch mirror
of the SpeechBrain module, random-initializes it, ports the state_dict
through :func:`load_ecapa_speechbrain`, and asserts activation-level parity —
so when the real artifact lands, loading it is a one-liner.

SpeechBrain schema recap (state_dict key → role):
  blocks.0.{conv.conv,norm.norm}            initial TDNNBlock (stem)
  blocks.{1..3}.tdnn1 / res2net_block.blocks.{j} / tdnn2 / se_block
                                            SE-Res2Net blocks
  mfa.{conv.conv,norm.norm}                 multi-layer feature aggregation
  asp.tdnn.{conv.conv,norm.norm}, asp.conv.conv
                                            attentive statistics pooling
  asp_bn.norm                               post-pooling BatchNorm
  fc.conv                                   final 192-d projection
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .ecapa import EcapaTdnn

# our conv+BN sub-dict fields <- torch module suffixes
_CONV_BN_FIELDS = {
    "w": "conv.conv.weight",
    "b": "conv.conv.bias",
    "bn_gamma": "norm.norm.weight",
    "bn_beta": "norm.norm.bias",
    "bn_mean": "norm.norm.running_mean",
    "bn_var": "norm.norm.running_var",
}
_BN_FIELDS = {
    "gamma": "norm.weight",
    "beta": "norm.bias",
    "mean": "norm.running_mean",
    "var": "norm.running_var",
}


def ecapa_speechbrain_key_map(net: EcapaTdnn | None = None) -> dict[str, tuple]:
    """torch state_dict key -> path tuple into our parameter tree."""
    net = net or EcapaTdnn()
    m: dict[str, tuple] = {}

    def conv_bn(prefix: str, *path):
        for ours, theirs in _CONV_BN_FIELDS.items():
            m[f"{prefix}.{theirs}"] = (*path, ours)

    conv_bn("blocks.0", "stem")
    for i in range(len(net.dilations)):
        t = i + 1
        conv_bn(f"blocks.{t}.tdnn1", f"block{i}", "conv1")
        for j in range(net.scale - 1):
            conv_bn(f"blocks.{t}.res2net_block.blocks.{j}", f"block{i}", "res2", j)
        conv_bn(f"blocks.{t}.tdnn2", f"block{i}", "conv2")
        m[f"blocks.{t}.se_block.conv1.conv.weight"] = (f"block{i}", "se_w1")
        m[f"blocks.{t}.se_block.conv1.conv.bias"] = (f"block{i}", "se_b1")
        m[f"blocks.{t}.se_block.conv2.conv.weight"] = (f"block{i}", "se_w2")
        m[f"blocks.{t}.se_block.conv2.conv.bias"] = (f"block{i}", "se_b2")
    conv_bn("mfa", "mfa")
    m["asp.tdnn.conv.conv.weight"] = ("att_w1",)
    m["asp.tdnn.conv.conv.bias"] = ("att_b1",)
    for ours, theirs in _BN_FIELDS.items():
        m[f"asp.tdnn.norm.{theirs}"] = ("att_bn", ours)
    m["asp.conv.conv.weight"] = ("att_w2",)
    m["asp.conv.conv.bias"] = ("att_b2",)
    for ours, theirs in _BN_FIELDS.items():
        m[f"asp_bn.{theirs}"] = ("post_bn", ours)
    m["fc.conv.weight"] = ("fc_w",)
    m["fc.conv.bias"] = ("fc_b",)
    return m


def ecapa_torch_manifest(net: EcapaTdnn | None = None) -> dict[str, tuple[int, ...]]:
    """Expected torch state_dict shapes (the contract the artifact must meet
    and the mapping must cover) — derived from the architecture config."""
    net = net or EcapaTdnn()
    c, s, cc = net.channels, net.scale, net.cat_channels
    w = c // s
    a = net.att_channels

    def conv_bn(prefix, c_out, c_in, k):
        return {
            f"{prefix}.conv.conv.weight": (c_out, c_in, k),
            f"{prefix}.conv.conv.bias": (c_out,),
            f"{prefix}.norm.norm.weight": (c_out,),
            f"{prefix}.norm.norm.bias": (c_out,),
            f"{prefix}.norm.norm.running_mean": (c_out,),
            f"{prefix}.norm.norm.running_var": (c_out,),
        }

    man: dict[str, tuple[int, ...]] = {}
    man.update(conv_bn("blocks.0", c, net.n_mels, 5))
    for i in range(len(net.dilations)):
        t = i + 1
        man.update(conv_bn(f"blocks.{t}.tdnn1", c, c, 1))
        for j in range(s - 1):
            man.update(conv_bn(f"blocks.{t}.res2net_block.blocks.{j}", w, w, 3))
        man.update(conv_bn(f"blocks.{t}.tdnn2", c, c, 1))
        man[f"blocks.{t}.se_block.conv1.conv.weight"] = (net.se_channels, c, 1)
        man[f"blocks.{t}.se_block.conv1.conv.bias"] = (net.se_channels,)
        man[f"blocks.{t}.se_block.conv2.conv.weight"] = (c, net.se_channels, 1)
        man[f"blocks.{t}.se_block.conv2.conv.bias"] = (c,)
    man.update(conv_bn("mfa", cc, cc, 1))
    man["asp.tdnn.conv.conv.weight"] = (a, 3 * cc, 1)
    man["asp.tdnn.conv.conv.bias"] = (a,)
    for suffix in ("weight", "bias", "running_mean", "running_var"):
        man[f"asp.tdnn.norm.norm.{suffix}"] = (a,)
        man[f"asp_bn.norm.{suffix}"] = (2 * cc,)
    man["asp.conv.conv.weight"] = (cc, a, 1)
    man["asp.conv.conv.bias"] = (cc,)
    man["fc.conv.weight"] = (net.emb_dim, 2 * cc, 1)
    man["fc.conv.bias"] = (net.emb_dim,)
    return man


def _set_path(tree: dict, path: tuple, value) -> None:
    node: Any = tree
    for i, p in enumerate(path[:-1]):
        child_is_list = isinstance(path[i + 1], int)
        if isinstance(p, int):
            while len(node) <= p:
                node.append([] if child_is_list else {})
            node = node[p]
        else:
            if p not in node:
                node[p] = [] if child_is_list else {}
            node = node[p]
    node[path[-1]] = value


def load_ecapa_speechbrain(
    src: str | Path | Mapping[str, Any],
    net: EcapaTdnn | None = None,
    strict: bool = True,
):
    """Port a SpeechBrain ECAPA ``embedding_model`` state_dict (or a path to
    ``embedding_model.ckpt``) into an :class:`EcapaTdnn` parameter tree.

    Conv weights keep torch's [out, in, k] layout (ours matches); BatchNorm
    weight/bias/running stats relabel to gamma/beta/mean/var.  Shapes are
    asserted against :func:`ecapa_torch_manifest` when ``strict``.
    """
    net = net or EcapaTdnn()
    if not isinstance(src, Mapping):
        import torch

        src = torch.load(str(src), map_location="cpu", weights_only=False)
        if isinstance(src, dict) and "state_dict" in src:
            src = src["state_dict"]
    sd: dict[str, np.ndarray] = {}
    for k, v in src.items():
        if k.endswith("num_batches_tracked"):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v, dtype=np.float32)

    key_map = ecapa_speechbrain_key_map(net)
    manifest = ecapa_torch_manifest(net)
    if strict:
        missing = sorted(set(key_map) - set(sd))
        extra = sorted(set(sd) - set(key_map))
        if missing or extra:
            raise ValueError(
                f"state_dict schema mismatch: missing={missing[:5]} "
                f"({len(missing)} total), unexpected={extra[:5]} ({len(extra)} total)"
            )
        for k, shape in manifest.items():
            if tuple(sd[k].shape) != shape:
                raise ValueError(f"{k}: expected {shape}, got {tuple(sd[k].shape)}")

    params: dict[str, Any] = {}
    for torch_key, path in key_map.items():
        if torch_key in sd:
            _set_path(params, path, jnp.asarray(sd[torch_key]))
    return params
