"""Exact IIR filtering as an O(log T) associative scan.

A biquad ``y[n] = v[n] - a1*y[n-1] - a2*y[n-2]`` (with the FIR part
``v = b0*x + b1*x[-1] + b2*x[-2]`` vectorized up front) is a first-order
affine recurrence on the state ``s[n] = (y[n], y[n-1])``:

    s[n] = A s[n-1] + (v[n], 0),   A = [[-a1, -a2], [1, 0]]

Affine maps compose associatively, so the whole filter runs as one
``jax.lax.associative_scan`` over (M, c) pairs — log-depth on the VPU, exact
to the recurrence (unlike FIR truncation), and free of the long-kernel conv
and FFT lowerings that the experimental axon TPU backend mishandles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def biquad_scan(x: jax.Array, b, a) -> jax.Array:
    """Apply one biquad (coefficients like scipy.signal.lfilter, a[0]=1)
    to [T] (or [..., T]) with zero initial state."""
    b = np.asarray(b, dtype=np.float64) / float(np.asarray(a)[0])
    a = np.asarray(a, dtype=np.float64) / float(np.asarray(a)[0])
    x0 = x
    x1 = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    x2 = jnp.concatenate([jnp.zeros_like(x[..., :2]), x[..., :-2]], axis=-1)
    v = float(b[0]) * x0 + float(b[1]) * x1 + float(b[2]) * x2

    a1, a2 = float(a[1]), float(a[2])
    shape = v.shape
    ones = jnp.ones(shape, v.dtype)
    zeros = jnp.zeros(shape, v.dtype)
    # element n carries (M = A, c = (v[n], 0)); scan composes left-to-right
    m11 = ones * (-a1)
    m12 = ones * (-a2)
    m21 = ones
    m22 = zeros

    def combine(lhs, rhs):
        l11, l12, l21, l22, lc1, lc2 = lhs
        r11, r12, r21, r22, rc1, rc2 = rhs
        # (Mr, cr) o (Ml, cl): M = Mr @ Ml ; c = Mr @ cl + cr
        n11 = r11 * l11 + r12 * l21
        n12 = r11 * l12 + r12 * l22
        n21 = r21 * l11 + r22 * l21
        n22 = r21 * l12 + r22 * l22
        c1 = r11 * lc1 + r12 * lc2 + rc1
        c2 = r21 * lc1 + r22 * lc2 + rc2
        return n11, n12, n21, n22, c1, c2

    out = jax.lax.associative_scan(
        combine, (m11, m12, m21, m22, v, zeros), axis=-1
    )
    # zero initial state: y[n] = c1[n]
    return out[4]


def sos_scan(x: jax.Array, sections) -> jax.Array:
    """Cascade of (b, a) biquad sections."""
    for b, a in sections:
        x = biquad_scan(x, b, a)
    return x
