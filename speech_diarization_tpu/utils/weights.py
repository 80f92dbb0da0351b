"""Shipped-weights resolution: one preference-ordered lookup.

Every pipeline resolves a default checkpoint as "first existing file from a
preference list under the repo ``weights/`` directory" — multi-condition
retrains shadow the round-1 synthetic weights when present.  Centralized so
a weight rename happens in one place and every consumer agrees.
"""
from __future__ import annotations

from pathlib import Path

WEIGHTS_ROOT = Path(__file__).resolve().parents[2] / "weights"

# Default speaker-encoder preference, most-capable first.  The robust
# mixed-family encoder (128-ch proto recipe + 4000 chip steps,
# 2026-08-18) dominates the round-1 in-domain specialist on EVERY measured
# domain: in-domain 0.53% DER (r1: 0.64), held-out dry 2.14 (r1: 53.7),
# reverb 2.0-2.5, white10 3.8, overlap 4.4 — scripts/eval_heldout.py.
# Streaming-trained (*_stream) weights engage the trunk-shared grid under
# grid_backend='auto'.
ENCODER_PREFERENCE = (
    "ecapa_robust_stream.npz",
    "ecapa_synthetic_full_stream.npz",
    "ecapa_synthetic_full.npz",
    "ecapa_synthetic.npz",
)


def prefer_weights(names, root: Path | None = None) -> Path | None:
    """First existing checkpoint from ``names`` under ``root`` (repo
    ``weights/`` by default); None when nothing ships."""
    root = Path(root) if root is not None else WEIGHTS_ROOT
    return next((root / n for n in names if (root / n).exists()), None)
