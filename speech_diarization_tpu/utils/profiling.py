"""Profiling helpers: stage wall-clock aggregation, XLA profiler hooks, and
model complexity counting.

The reference's only complexity tool is a one-off ``ptflops`` call
(``gtcrn.py:325-328``); here :func:`model_complexity` computes parameter
counts and (via jax cost analysis) FLOP estimates for any jitted callable,
and :class:`Profiler` wraps ``jax.profiler`` traces for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable

import jax
import numpy as np


class Profiler:
    """Accumulates named wall-clock spans; optionally captures an XLA trace."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    @contextlib.contextmanager
    def xla_trace(self, logdir: str):
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }


def model_complexity(fn: Callable, *example_args: Any) -> dict[str, float]:
    """FLOP/parameter estimate for a jittable callable via XLA cost analysis
    (the ``ptflops`` analog for our stack)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax versions
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


def count_params(params) -> int:
    return int(sum(np.prod(np.shape(v)) for v in jax.tree.leaves(params)))
