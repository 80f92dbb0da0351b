"""Rewrite shipped .npz checkpoints with float16 storage (half the bytes).

``models/port.load_params_npz`` upcasts f16 floats back to f32 on load, so
compression is invisible to every consumer.  Integer arrays and the
``__meta__`` sidecar are preserved verbatim.

Usage:
    python scripts/compress_weights.py weights/ecapa_proto_small.npz [...]
    python scripts/compress_weights.py --check weights/*.npz   # report only
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def compress(path: Path, check_only: bool = False) -> tuple[int, int, float]:
    """Returns (bytes_before, bytes_after, max_rel_err)."""
    before = path.stat().st_size
    arrays: dict[str, np.ndarray] = {}
    max_rel = 0.0
    with np.load(str(path)) as data:
        for k in data.files:
            a = data[k]
            if k != "__meta__" and np.issubdtype(a.dtype, np.floating) \
                    and a.dtype != np.float16:
                a16 = a.astype(np.float16)
                denom = np.maximum(np.abs(a), 1e-3)
                max_rel = max(max_rel, float(
                    np.max(np.abs(a16.astype(a.dtype) - a) / denom)))
                a = a16
            arrays[k] = a
    if check_only:
        return before, before, max_rel
    # np.savez appends ".npz" unless the name already ends with it
    tmp = path.with_name(path.stem + ".tmp.npz")
    np.savez(str(tmp), **arrays)
    tmp.replace(path)
    return before, path.stat().st_size, max_rel


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+", type=Path)
    ap.add_argument("--check", action="store_true",
                    help="report f16 rounding error without rewriting")
    args = ap.parse_args(argv)
    report = []
    for p in args.paths:
        b, a, err = compress(p, check_only=args.check)
        report.append({"file": p.name, "mb_before": round(b / 1e6, 2),
                       "mb_after": round(a / 1e6, 2),
                       "f16_max_rel_err": round(err, 5)})
        print(json.dumps(report[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
