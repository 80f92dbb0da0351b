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
    import os

    import jax

    platform = jax.devices()[0].platform.lower()
    if os.environ.get("SDTPU_ASSUME_FULL_BACKEND"):
        return BackendFeatures(platform, fft=True, sort=True, eigh=True)
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return BackendFeatures(platform, fft=True, sort=True, eigh=True)
    # TPU-family platforms get the conservative op set by default: the host
    # mirrors only touch tiny per-file matrices, while a wrong full-support
    # guess on the axon tunnel poisons the process.  Production TPU fleets
    # (where sort/eigh work) can set SDTPU_ASSUME_FULL_BACKEND=1.
    return BackendFeatures(platform, fft=False, sort=False, eigh=False)
