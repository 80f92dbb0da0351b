"""Backend capability detection.

The experimental 'axon' TPU backend (single-chip tunnel) lacks lowerings for
FFT, sort (and everything built on it: jnp.sort / percentile / median) and
eigh — and, critically, a failed compile POISONS the process: every
subsequent device computation then fails.  Runtime try/except fallback is
therefore not viable; modules consult :func:`features` and pick a supported
path statically.  Verified working on axon: matmul/conv, lax.scan,
lax.while_loop, associative_scan (float), reduce_window (float), lax.top_k,
gather, cumsum, argmax.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache


@dataclass(frozen=True)
class BackendFeatures:
    platform: str
    fft: bool
    sort: bool
    eigh: bool

    @property
    def full(self) -> bool:
        return self.fft and self.sort and self.eigh


@lru_cache(maxsize=1)
def features() -> BackendFeatures:
    import jax

    platform = jax.devices()[0].platform.lower()
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return BackendFeatures(platform, fft=True, sort=True, eigh=True)
    if platform == "tpu":
        # real TPU backends support all three (sort via lowered comparator
        # networks, eigh via QR); the axon tunnel reports platform 'axon'
        return BackendFeatures(platform, fft=True, sort=True, eigh=True)
    # axon or unknown experimental backends: assume the minimal op set
    return BackendFeatures(platform, fft=False, sort=False, eigh=False)
