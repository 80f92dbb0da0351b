"""Sharding specs: batch layout, parameter partition rules.

Pattern (the scaling-book recipe): pick a mesh, annotate shardings on inputs/
params, and let XLA GSPMD insert the collectives — no hand-written NCCL-style
communication (the reference has none to translate anyway, SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec(mesh: Mesh) -> NamedSharding:
    """[B, ...] arrays sharded along dp, replicated along tp."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(jnp_asarray(x), batch_spec(mesh))


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def param_partition_specs(params: dict[str, Any], mesh: Mesh,
                          tp_patterns: tuple[str, ...] = ()) -> dict[str, NamedSharding]:
    """Partition specs for a flat/nested param tree: arrays whose key path
    matches one of ``tp_patterns`` get their FIRST dim (output channels /
    classes) sharded over 'tp'; everything else is replicated.

    Sharding output channels of a conv/linear makes the following op a
    column-parallel matmul; GSPMD inserts the all-gather/reduce where layouts
    meet (Megatron-style tensor parallelism, expressed declaratively).
    """
    tp_size = mesh.shape["tp"]

    def spec_for(path: str, leaf) -> NamedSharding:
        shape = np.shape(leaf)
        if (
            tp_size > 1
            and any(pat in path for pat in tp_patterns)
            and len(shape) >= 1
            and shape[0] % tp_size == 0
        ):
            return NamedSharding(mesh, P("tp", *([None] * (len(shape) - 1))))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        spec_for(jax.tree_util.keystr(path), leaf) for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)
