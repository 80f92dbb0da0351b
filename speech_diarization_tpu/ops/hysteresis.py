"""Hysteresis (Schmitt-trigger) binarization of VAD probabilities.

The reference runs this as a numba ``nopython`` loop on host (``vad.py:59-74``):
state machine that turns on at ``p >= on`` and off at ``p < off``.

TPU-native formulation: the state update is

    talking[t] = p[t] >= on  OR  (talking[t-1] AND p[t] >= off)

Define a[t] = (p[t] >= on), c[t] = (p[t] >= off).  Then
talking[t] = a[t] | (c[t] & talking[t-1]), which is an associative
boolean affine recurrence — so it runs in O(log T) depth via
``jax.lax.associative_scan`` instead of a 360k-step sequential scan.
Composition law for pairs (a, c):  (a2 | (c2 & a1), c2 & c1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hysteresis_binarize(
    probs: jax.Array, on: float = 0.6, off: float = 0.4
) -> jax.Array:
    """[T] probabilities -> [T] bool speech mask (initial state: not talking).

    Carried as float32 {0,1} (min/max play the role of and/or) so the
    associative scan lowers on every backend, including axon TPU.
    """
    a = (probs >= on).astype(jnp.float32)
    c = (probs >= off).astype(jnp.float32)

    def combine(x, y):
        ax, cx = x
        ay, cy = y
        # boolean algebra on {0,1} floats: or = max, and = min
        return jnp.maximum(ay, jnp.minimum(cy, ax)), jnp.minimum(cy, cx)

    out_a, _ = jax.lax.associative_scan(combine, (a, c))
    return out_a > 0.5
