"""Pallas TPU kernels for the hot DSP ops."""
from .fused_fbank import fused_log_mel

__all__ = ["fused_log_mel"]
