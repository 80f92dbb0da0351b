"""Checkpoint porting: torch / ONNX state dicts -> JAX parameter pytrees.

The reference's model zoo loads torch checkpoints (GTCRN DNS3 tar,
``gtcrn_wrap.py:10-15``), SpeechBrain hparams bundles (``speech_encode.py:64-70``)
and ONNX graphs (``speech_encode.py:42-50``).  Our parameter dicts use torch
``state_dict`` keys directly (see ``models/gtcrn.py``), so porting is a pure
array relabel plus dtype normalization — numerics are then verified by golden
activation tests (``tests/test_gtcrn_parity.py``; SURVEY.md §7.4 item 1).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def port_torch_state_dict(state_dict: Mapping[str, Any]) -> dict[str, jnp.ndarray]:
    """Convert a torch ``state_dict`` (tensors or ndarrays) to a flat JAX
    param dict, dropping bookkeeping buffers (``num_batches_tracked``)."""
    out: dict[str, jnp.ndarray] = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        if hasattr(v, "detach"):  # torch tensor without importing torch here
            v = v.detach().cpu().numpy()
        out[k] = jnp.asarray(np.asarray(v, dtype=np.float32))
    return out


def load_gtcrn_checkpoint(path: str | Path) -> dict[str, jnp.ndarray]:
    """Load the GTCRN DNS3 checkpoint (torch tar with a ``model`` entry,
    ``gtcrn_wrap.py:13-15``) into our parameter dict."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return port_torch_state_dict(sd)


def save_params_npz(
    params: Mapping[str, jnp.ndarray], path: str | Path,
    meta: dict | None = None,
    store_dtype=None,
) -> None:
    """Framework-native checkpoint format: flat npz (no torch dependency).
    ``meta`` (a JSON-serializable dict, e.g. the architecture config) is
    stored under the reserved ``__meta__`` key.  ``store_dtype=np.float16``
    halves on-disk size for shipped weights; :func:`load_params_npz` upcasts
    f16 back to f32 transparently, so consumers never see the storage dtype."""
    import json

    arrays = {}
    for k, v in params.items():
        a = np.asarray(v)
        if store_dtype is not None and np.issubdtype(a.dtype, np.floating):
            a = a.astype(store_dtype)
        arrays[k] = a
    if meta is not None:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(str(path), **arrays)


def load_params_npz(path: str | Path) -> dict[str, jnp.ndarray]:
    """f16-stored floats (shipped-weight compression) upcast to f32 here so
    every downstream consumer computes at full precision regardless of the
    storage dtype."""
    out: dict[str, jnp.ndarray] = {}
    with np.load(str(path)) as data:
        for k in data.files:
            if k == "__meta__":
                continue
            a = data[k]
            if a.dtype == np.float16:
                a = a.astype(np.float32)
            out[k] = jnp.asarray(a)
    return out


def load_params_meta(path: str | Path) -> dict | None:
    """Read the ``__meta__`` sidecar stored by :func:`save_params_npz`."""
    import json

    with np.load(str(path)) as data:
        if "__meta__" not in data.files:
            return None
        return json.loads(bytes(data["__meta__"]).decode())


def update_params_meta(path: str | Path, **updates) -> dict:
    """Merge ``updates`` into a checkpoint's ``__meta__`` sidecar in place
    (e.g. a calibrated ``refine_sub_cos`` from scripts/calibrate_bisect.py).
    Returns the merged meta."""
    with np.load(str(path)) as data:
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
    meta = (load_params_meta(path) or {}) | updates
    save_params_npz(arrays, path, meta=meta)
    return meta
