"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: under the axon TPU tunnel the JAX_PLATFORMS env var is ignored, so we
force the platform through jax.config before any device is touched.
"""
import os

# Must be set before jax initializes its backends.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def synth_tone(freq: float, dur_s: float, sr: int = 16000, amp: float = 0.3) -> np.ndarray:
    t = np.arange(int(dur_s * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def synth_noise(dur_s: float, sr: int = 16000, amp: float = 0.1, seed: int = 0) -> np.ndarray:
    g = np.random.default_rng(seed)
    return (amp * g.standard_normal(int(dur_s * sr))).astype(np.float32)
