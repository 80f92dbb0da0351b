"""Evaluation metrics (new — the reference computes no DER anywhere,
SURVEY.md §5 'Metrics')."""
from .der import diarization_error_rate, jaccard_error_rate, DerBreakdown

__all__ = ["diarization_error_rate", "jaccard_error_rate", "DerBreakdown"]
