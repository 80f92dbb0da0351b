"""Fixed-iteration masked k-means, fully jittable.

The number of clusters ``k`` is a *traced* value bounded by a static ``k_max``:
invalid centroid slots are masked to +inf distance, so one compiled program
serves every speaker count the eigengap estimator may pick (no data-dependent
shapes — SURVEY.md §7.1 item 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_init(x: jax.Array, k_max: int) -> jax.Array:
    """Deterministic farthest-point seeding: start at the point closest to the
    global mean, then repeatedly take the point farthest from all chosen seeds."""
    n = x.shape[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    first = jnp.argmin(jnp.sum((x - mean) ** 2, axis=1))

    def body(i, state):
        centers, min_d = state
        d = jnp.sum((x - centers[i - 1][None, :]) ** 2, axis=1)
        min_d = jnp.minimum(min_d, d)
        centers = centers.at[i].set(x[jnp.argmax(min_d)])
        return centers, min_d

    centers0 = jnp.zeros((k_max, x.shape[1]), x.dtype).at[0].set(x[first])
    min_d0 = jnp.full((n,), jnp.inf, x.dtype)
    centers, _ = jax.lax.fori_loop(1, k_max, body, (centers0, min_d0))
    return centers


def kmeans(
    x: jax.Array,
    k: jax.Array | int,
    k_max: int,
    iters: int = 25,
    sample_weight: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd iterations with masked centroids.

    Args:
        x: [N, D] points.
        k: effective cluster count (traced scalar), 1 <= k <= k_max.
        k_max: static bound (compiled size).
        sample_weight: optional [N] weights (0 disables padded points).

    Returns (labels [N] int32 in [0, k), centers [k_max, D]).
    """
    n = x.shape[0]
    k = jnp.asarray(k, jnp.int32)
    valid = (jnp.arange(k_max) < k)  # [k_max]
    w = jnp.ones((n,), x.dtype) if sample_weight is None else sample_weight

    centers = farthest_point_init(x, k_max)

    def step(_, centers):
        d = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        d = jnp.where(valid[None, :], d, jnp.inf)
        labels = jnp.argmin(d, axis=1)
        onehot = (labels[:, None] == jnp.arange(k_max)[None, :]).astype(x.dtype)
        onehot = onehot * w[:, None]
        counts = jnp.sum(onehot, axis=0)  # [k_max]
        sums = onehot.T @ x  # [k_max, D]
        new_centers = sums / jnp.maximum(counts, 1e-9)[:, None]
        # keep empty/invalid centroids where they were
        keep = (counts > 0) & valid
        return jnp.where(keep[:, None], new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    d = jnp.where(valid[None, :], d, jnp.inf)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    return labels, centers
