"""Sharded single-file inference: one file's dense window grid across chips.

`pipelines/corpus.py` parallelizes over FILES (one worker per device); when
there are fewer files than chips — the latency-sensitive case, e.g. one long
meeting on a v5e-8 — the win comes from sharding the window-grid embedding
pass itself.  The grid batch ([512, win] waveform windows) is laid out along
the mesh's 'dp' axis; parameters are replicated (optionally tensor-parallel
along 'tp' via the train-time partition rules); XLA GSPMD inserts the
all-gather at the output boundary.  SURVEY.md §2.3's plan, fulfilled for
inference (training steps were already sharded in r1).

Numerical contract: identical results to single-device execution (the batch
rows are independent), asserted by tests/test_sharded_inference.py on the
8-virtual-device CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import param_partition_specs


def make_sharded_encode_fn(
    model,
    params,
    mesh: Mesh,
    tp_patterns: tuple[str, ...] = (),
) -> Callable:
    """Wrap ``model.encode_batch`` so the window-batch dimension is sharded
    over the mesh's 'dp' axis — a drop-in ``encode_fn`` for
    :class:`~speech_diarization_tpu.pipelines.diarize.DiarizationPipeline`.

    The pipeline's ``embed_windows`` always dispatches full fixed-size
    batches (cfg.embed.batch_size, default 512), so the batch divides any
    power-of-two dp size; other callers must pad to a multiple of dp.
    """
    specs = param_partition_specs(params, mesh, tp_patterns)
    params_s = jax.device_put(params, specs)
    batch_sharding = NamedSharding(mesh, P("dp"))
    out_sharding = NamedSharding(mesh, P())  # gather embeddings once

    @partial(jax.jit, out_shardings=out_sharding)
    def _encode(p, wavs):
        return model.encode_batch(p, wavs)

    def encode_fn(wavs):
        wavs = jax.device_put(jnp.asarray(wavs), batch_sharding)
        return _encode(params_s, wavs)

    return encode_fn


def make_sharded_framewise_fn(fn: Callable, mesh: Mesh) -> Callable:
    """Shard a chunk-batched framewise function ([G, T] -> [G, F], e.g. the
    VAD probs closure) over 'dp'.  ``G`` must be a multiple of the dp size —
    ``pipelines/chunking.GROUP_BUCKETS`` guarantees that for power-of-two
    meshes once ``group >= dp``."""
    batch_sharding = NamedSharding(mesh, P("dp"))

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def _apply(x):
        return fn(x)

    def framewise(x):
        dp = mesh.shape["dp"]
        if x.ndim >= 1 and x.shape[0] % dp == 0:
            x = jax.device_put(jnp.asarray(x), batch_sharding)
        return _apply(x)

    return framewise
