"""Sticky-HMM Viterbi decoding on device.

Replaces the host DP loop of ``viterbi_hmm`` (``diar_diag.py:231-247``): a
K-state HMM with self-loop probability ``alpha`` and uniform switching mass,
decoded over per-step speaker scores.  Forward pass is a ``lax.scan`` over time
with an O(K²) vectorized inner step; backtrace is a reverse scan over the
stored argmax pointers.  K is tiny (≤ max_speakers), T is the number of
segments/windows, so this is bandwidth-trivial; the win is staying on device
between clustering and resegmentation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sticky_transition_logits(k: int, alpha: float = 0.995) -> jax.Array:
    """log transition matrix: ``alpha`` on the diagonal, (1-alpha)/(K-1) off —
    mirrors ``diar_diag.py:233-235``."""
    eps = 1e-8
    if k == 1:
        return jnp.zeros((1, 1), dtype=jnp.float32)
    off = jnp.log((1.0 - alpha) / (k - 1) + eps)
    diag = jnp.log(alpha + eps)
    return jnp.full((k, k), off, dtype=jnp.float32).at[jnp.arange(k), jnp.arange(k)].set(diag)


def viterbi_decode(scores: jax.Array, log_a: jax.Array) -> jax.Array:
    """MAP state path of shape [T] from emission scores [T, K] and log
    transitions [K, K] (uniform initial distribution, like the reference)."""
    t, k = scores.shape
    if t == 0:
        return jnp.zeros((0,), dtype=jnp.int32)

    def forward(dp, emit):
        cand = dp[:, None] + log_a  # [K_prev, K]
        ptr = jnp.argmax(cand, axis=0)  # [K]
        dp_next = jnp.max(cand, axis=0) + emit
        return dp_next, ptr

    dp_last, ptrs = jax.lax.scan(forward, scores[0], scores[1:])
    last = jnp.argmax(dp_last).astype(jnp.int32)

    def backward(state, ptr):
        prev = ptr[state]
        return prev, prev

    _, path_rev = jax.lax.scan(backward, last, ptrs, reverse=True)
    return jnp.concatenate([path_rev.astype(jnp.int32), last[None]])
