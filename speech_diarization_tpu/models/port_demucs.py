"""MVSEP-CDX23 Demucs ``.th`` checkpoint → :class:`HTDemucsRef` loader.

The reference downloads three artifacts (``97d170e1-{a778de4a,dbb4db15,
e41a5468}.th``, ``/root/reference/dialog-demix.py:9-28``) and loads them via
``demucs.states.load_model``.  That serializer stores
``{'klass': <class>, 'args': (...), 'kwargs': {...}, 'state': state_dict}``
(torch pickle), so a port is:

1. read the pickle, take ``kwargs`` → instantiate :class:`HTDemucsRef` with
   the matching architecture config (constructor names map 1:1);
2. take ``state`` → drop torch bookkeeping, strict-validate every key and
   shape against :meth:`HTDemucsRef.manifest`;
3. relabel into the JAX param dict.

Zero-egress testing mirrors ``port_zipenhancer``: the test suite round-trips
a random-initialized state_dict through this loader and asserts forward
equality, plus an env-gated real-artifact test
(``SDTPU_DEMUCS_CKPT=/path/to/97d170e1-a778de4a.th``).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .demucs_ref import HTDemucsRef

#: demucs.htdemucs.HTDemucs kwarg -> HTDemucsRef constructor kwarg
_KWARG_MAP = {
    "sources": "sources",
    "audio_channels": "audio_channels",
    "channels": "channels",
    "growth": "growth",
    "depth": "depth",
    "nfft": "nfft",
    "kernel_size": "kernel_size",
    "stride": "stride",
    "context": "context",
    "context_enc": "context_enc",
    "bottom_channels": "bottom_channels",
    "t_layers": "t_layers",
    "t_heads": "t_heads",
    "t_hidden_scale": "t_hidden_scale",
    "dconv_depth": "dconv_depth",
    "dconv_comp": "dconv_comp",
    "freq_emb": "freq_emb_scale",
    "samplerate": "samplerate",
    "segment": "segment",
}

_DROP_SUFFIXES = ("num_batches_tracked",)


def model_from_kwargs(kwargs: Mapping[str, Any]) -> HTDemucsRef:
    """Instantiate the JAX graph from a checkpoint's pickled HTDemucs kwargs
    (unknown training-only kwargs are ignored; graph-affecting ones map 1:1)."""
    cfg = {}
    for src, dst in _KWARG_MAP.items():
        if src in kwargs:
            v = kwargs[src]
            cfg[dst] = tuple(v) if src == "sources" else v
    return HTDemucsRef(**cfg)


def load_htdemucs(
    src: str | Path | Mapping[str, Any],
    model: HTDemucsRef | None = None,
    strict: bool = True,
) -> tuple[HTDemucsRef, dict[str, jax.Array]]:
    """Port a ``demucs.states``-serialized checkpoint (or a raw state_dict)
    into ``(HTDemucsRef, params)``.

    When ``src`` is a path/pickle with ``kwargs``, the architecture config is
    reconstructed from the checkpoint itself; otherwise ``model`` (default
    config = the released ``htdemucs`` hyperparameters with the CDX23
    dialog/effect/music sources) defines the expected schema.
    """
    state: Mapping[str, Any]
    if isinstance(src, Mapping) and "state" not in src:
        state = src
    else:
        if not isinstance(src, Mapping):
            import torch

            src = torch.load(str(src), map_location="cpu", weights_only=False)
        if "kwargs" in src and model is None:
            model = model_from_kwargs(src["kwargs"])
        state = src.get("state", src)
        if isinstance(state, Mapping) and state.get("__quantized"):
            raise NotImplementedError(
                "diffq-quantized demucs checkpoints are not supported; "
                "re-export with demucs.states.save_model(quantizer=None)"
            )
    model = model or HTDemucsRef()

    sd: dict[str, np.ndarray] = {}
    for k, v in state.items():
        if k.endswith(_DROP_SUFFIXES) or k.startswith("__"):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v, dtype=np.float32)

    manifest = model.manifest()
    if strict:
        missing = sorted(set(manifest) - set(sd))
        extra = sorted(set(sd) - set(manifest))
        if missing or extra:
            raise ValueError(
                "HTDemucs state_dict schema mismatch: "
                f"missing={missing[:5]} ({len(missing)} total), "
                f"unexpected={extra[:5]} ({len(extra)} total) — check the "
                "checkpoint's kwargs against the HTDemucsRef constructor"
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

    return model, {k: jnp.asarray(v) for k, v in sd.items() if k in manifest}
