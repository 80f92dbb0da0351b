"""Shipped-weights resolution: one preference-ordered lookup.

Every pipeline resolves a default checkpoint as "first existing file from a
preference list under the repo ``weights/`` directory" — multi-condition
retrains shadow the round-1 synthetic weights when present.  Centralized so
a weight rename happens in one place and every consumer agrees.
"""
from __future__ import annotations

from pathlib import Path

WEIGHTS_ROOT = Path(__file__).resolve().parents[2] / "weights"


def prefer_weights(names, root: Path | None = None) -> Path | None:
    """First existing checkpoint from ``names`` under ``root`` (repo
    ``weights/`` by default); None when nothing ships."""
    root = Path(root) if root is not None else WEIGHTS_ROOT
    return next((root / n for n in names if (root / n).exists()), None)
