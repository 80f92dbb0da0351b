"""Multi-chip parallelism over `jax.sharding` meshes.

The reference has NO distributed layer (grep-verified, SURVEY.md §2.3) — its
only parallelism is CUDA batch loops.  Here parallelism is designed in:

  * **dp** (data): batches of windows/files sharded across chips over ICI;
    the natural axis for diarization inference (each file decomposes into a
    dense window grid — SURVEY.md §2.3).
  * **tp** (tensor): channel/class dimensions of the embedder and its
    AAM-softmax classifier head sharded for training larger encoders;
    XLA GSPMD inserts the all-reduces.
  * pp/ep are intentionally absent: the model zoo tops out at ~20M params
    (ECAPA), far below pipeline/expert-parallel scale; sp appears as the
    chunk axis of enhancement streaming (``pipelines/enhance.py``), which
    shards over dp the same way.
"""
from .inference import make_sharded_encode_fn, make_sharded_framewise_fn
from .mesh import make_mesh, default_mesh_shape
from .sharding import shard_batch, replicate, batch_spec, param_partition_specs

__all__ = [
    "make_sharded_encode_fn",
    "make_sharded_framewise_fn",
    "make_mesh",
    "default_mesh_shape",
    "shard_batch",
    "replicate",
    "batch_spec",
    "param_partition_specs",
]
