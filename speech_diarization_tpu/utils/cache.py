"""Persistent XLA compilation cache, keyed by host machine.

The repo-level ``.jax_cache`` directory is shared across driver hosts with
different CPU microarchitectures.  JAX's persistent cache key covers the HLO
and compile options but NOT the host CPU features baked into XLA:CPU AOT
results — loading an entry compiled on an AVX512-``prefer-no-gather`` host
onto a machine without those features emits ``cpu_aot_loader`` errors and can
SIGILL mid-run (this is what killed the round-1 demix backward pass on CPU,
STATUS.md "SIGILLs the axon compile helper").

Fix: sub-directory the cache by a fingerprint of the execution environment —
CPU flag set for the host platform, plain platform name for accelerators
(TPU executables are keyed by the accelerator target, which IS in the key).
"""
from __future__ import annotations

import hashlib
from pathlib import Path


def machine_fingerprint() -> str:
    """Short hash of this host's CPU feature set AND kernel boot id.

    The cpuinfo flag set alone is NOT sufficient: this build runs in a VM
    that lands on different physical hosts across restarts, the virtualized
    ``/proc/cpuinfo`` flags can hash identically while XLA's runtime cpuid
    probe bakes different (pseudo-)features — ``+prefer-no-gather`` et al. —
    into AOT results, which then SIGILL when loaded after a migration
    (observed 2026-08-17: ``cpu_aot_loader`` feature-mismatch errors on
    entries written under the same flags hash).  The boot id changes on
    every VM (re)boot, so entries never outlive the machine incarnation
    that compiled them; the only cost is one recompile per boot."""
    try:
        text = Path("/proc/cpuinfo").read_text()
        flags = next(
            (ln for ln in text.splitlines() if ln.startswith("flags")), ""
        )
    except OSError:
        import platform

        flags = platform.machine() + platform.processor()
    try:
        boot = Path("/proc/sys/kernel/random/boot_id").read_text().strip()
    except OSError:
        boot = ""
    return hashlib.sha256(f"{flags}|{boot}".encode()).hexdigest()[:12]


def setup_compilation_cache(root: str | Path | None = None) -> Path:
    """Point JAX's persistent compilation cache at a host-safe directory.

    Layout: ``<root>/.jax_cache/<platform>-<fingerprint>`` — one sub-cache
    per (platform context, CPU feature set, jax version), so AOT results
    never cross incompatible hosts or backend contexts (the axon plugin's
    CPU compile helper bakes different pseudo-features — ``prefer-no-gather``
    et al. — than a ``JAX_PLATFORMS=cpu`` process).  Only cost of a split:
    one re-compile per fresh (host, context) pair.

    Call before the first device touch.  Returns the directory used.
    """
    import os

    import jax

    if root is None:
        root = Path(__file__).resolve().parents[2]
    platform = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS")
        or "default"
    ).replace(",", "+")
    tag = hashlib.sha256(
        f"{machine_fingerprint()}|{jax.__version__}".encode()
    ).hexdigest()[:12]
    cache = Path(root) / ".jax_cache" / f"{platform}-{tag}"
    cache.mkdir(parents=True, exist_ok=True)
    # prune sub-caches of the SAME platform from previous machine
    # incarnations — unreadable here (feature mismatch) and ~1 GB/boot
    import shutil

    for sib in cache.parent.glob(f"{platform}-*"):
        if sib.name != cache.name and sib.is_dir():
            shutil.rmtree(sib, ignore_errors=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these knobs — cache is best-effort
        pass
    return cache
