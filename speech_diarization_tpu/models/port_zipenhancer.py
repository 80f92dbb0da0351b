"""ModelScope ZipEnhancer checkpoint → :class:`ZipEnhancerRef` loader.

The reference consumes the ``iic/speech_zipenhancer_ans_multiloss_16k_base``
artifact through the ModelScope ANS pipeline (``zipenhancer_pipe.py:119-125``)
or directly as ``ans.model`` (``zipenhancex.py:150-156``).  The artifact of
interest is the bundle's torch state_dict (``pytorch_model.bin`` /
``*.pth``); its generator submodule names follow the MP-SENet +
icefall-Zipformer2 conventions that :mod:`zipenhancer_ref` keys its
parameters by, so porting is a relabel:

1. strip the wrapper prefix (``generator.`` / ``model.`` / ``module.`` —
   auto-detected from the key roots),
2. drop training-only entries (balancers/whiteners are parameterless
   identities at inference; discriminator weights are not part of the
   enhancement graph; ``num_batches_tracked`` is torch bookkeeping),
3. strict-validate every remaining key and shape against the manifest
   derived from the target architecture config.

Zero-egress testing mirrors ``port_ecapa``: ``tests/test_zipenhancer_ref.py``
round-trips a random-initialized state_dict through this loader and asserts
output equality, so when the real artifact lands, loading is a one-liner
(adjust the constructor config to the bundle's ``config.yaml`` first — a
mismatch fails loudly here, never silently).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .zipenhancer_ref import ZipEnhancerRef

#: key roots of the enhancement graph (used for wrapper-prefix detection)
_ROOTS = ("dense_encoder.", "ts_blocks.", "mask_decoder.", "phase_decoder.")

#: state_dict entries that exist only for training and hold no inference
#: semantics (dropped silently)
_DROP_SUFFIXES = ("num_batches_tracked",)
_DROP_CONTAINS = ("balancer", "whiten", "discriminator", "activation_dropout")


def zipenhancer_manifest(
    model: ZipEnhancerRef | None = None,
) -> dict[str, tuple[int, ...]]:
    """Expected state_dict key → shape for ``model``'s configuration.

    Derived from the architecture itself via ``jax.eval_shape`` over
    :meth:`ZipEnhancerRef.init` — the manifest can never drift from the
    graph definition.
    """
    model = model or ZipEnhancerRef()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    return {k: tuple(v.shape) for k, v in shapes.items()}


def _strip_prefix(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Remove one wrapper prefix (``generator.`` etc.) if every graph root
    appears only under it."""
    if any(k.startswith(_ROOTS) for k in sd):
        return sd
    prefixes = {k.split(".", 1)[0] for k in sd if "." in k}
    for pref in sorted(prefixes):
        stripped = {
            k[len(pref) + 1 :]: v for k, v in sd.items()
            if k.startswith(pref + ".")
        }
        if not stripped:
            continue
        result = _strip_prefix(stripped)  # peel nested wrappers too
        if any(k.startswith(_ROOTS) for k in result):
            return result
    return sd


def load_zipenhancer_modelscope(
    src: str | Path | Mapping[str, Any],
    model: ZipEnhancerRef | None = None,
    strict: bool = True,
) -> dict[str, jax.Array]:
    """Port a ModelScope ZipEnhancer state_dict (or checkpoint path) into a
    :class:`ZipEnhancerRef` parameter dict.

    ``strict`` asserts full key coverage and exact shape agreement with
    :func:`zipenhancer_manifest`; the error lists the first mismatches so a
    config discrepancy with the artifact's ``config.yaml`` is diagnosable
    from the message alone.
    """
    model = model or ZipEnhancerRef()
    if not isinstance(src, Mapping):
        import torch

        src = torch.load(str(src), map_location="cpu", weights_only=False)
        for key in ("state_dict", "model", "generator"):
            if isinstance(src, dict) and key in src and isinstance(
                    src[key], (dict, Mapping)):
                src = src[key]
                break

    sd: dict[str, np.ndarray] = {}
    for k, v in src.items():
        if k.endswith(_DROP_SUFFIXES) or any(t in k for t in _DROP_CONTAINS):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v, dtype=np.float32)
    sd = _strip_prefix(sd)

    manifest = zipenhancer_manifest(model)
    if strict:
        missing = sorted(set(manifest) - set(sd))
        extra = sorted(set(sd) - set(manifest))
        if missing or extra:
            raise ValueError(
                "ZipEnhancer state_dict schema mismatch: "
                f"missing={missing[:5]} ({len(missing)} total), "
                f"unexpected={extra[:5]} ({len(extra)} total) — check the "
                "bundle's config.yaml against the ZipEnhancerRef constructor"
            )
        bad = [
            (k, manifest[k], tuple(sd[k].shape))
            for k in manifest if tuple(sd[k].shape) != manifest[k]
        ]
        if bad:
            k, want, got = bad[0]
            raise ValueError(
                f"{len(bad)} shape mismatches, first: {k} expected {want}, "
                f"got {got}"
            )

    return {k: jnp.asarray(v) for k, v in sd.items() if k in manifest}
