"""Device mesh construction helpers."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, tp: int = 1) -> tuple[int, int]:
    """(dp, tp) factorization of ``n_devices``; tp clamped to a divisor."""
    tp = max(1, tp)
    while n_devices % tp != 0:
        tp -= 1
    return n_devices // tp, tp


def make_mesh(
    n_devices: int | None = None,
    tp: int = 1,
    axis_names: tuple[str, str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Build a 2-D ('dp','tp') mesh over the first ``n_devices`` devices.

    On a single host this lays dp-major over the ICI ring; multi-host layouts
    inherit jax's device order (dp across hosts rides DCN, which is what we
    want for file-level data parallelism — SURVEY.md §2.3).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, tp = default_mesh_shape(len(devices), tp)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names)
