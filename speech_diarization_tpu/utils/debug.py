"""Debug/sanitizer toggles (the 'race detection / sanitizers' slot of
SURVEY.md §5 — absent in the reference; here: NaN tracing, jit bypass,
shape assertions via chex)."""
from __future__ import annotations

import contextlib

import jax


def enable_nan_checks() -> None:
    """Raise on any NaN produced inside jitted code (debug builds only —
    disables some fusion)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


@contextlib.contextmanager
def no_jit():
    """Run a block eagerly (op-by-op) for debugging."""
    with jax.disable_jit():
        yield


def assert_shape(x, shape) -> None:
    """Thin chex wrapper so call sites don't import chex directly."""
    import chex

    chex.assert_shape(x, shape)
