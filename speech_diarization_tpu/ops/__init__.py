"""On-device algorithmic primitives (XLA control flow + Pallas kernels).

Replaces the reference's numba/scipy/sklearn host kernels:
hysteresis (``vad.py:59-74``), binary morphology (``vad.py:77-87``),
peak finding (``anti_stick_diarize.py:111``), Viterbi (``diar_diag.py:231-247``),
mask→segments (``vad.py:90-163``).
"""
from .hysteresis import hysteresis_binarize
from .morphology import binary_opening, binary_closing, morph_open_close
from .peaks import find_peaks_zscore
from .viterbi import viterbi_decode, sticky_transition_logits
from .segments import mask_to_segments_host, segments_to_mask

__all__ = [
    "hysteresis_binarize",
    "binary_opening",
    "binary_closing",
    "morph_open_close",
    "find_peaks_zscore",
    "viterbi_decode",
    "sticky_transition_logits",
    "mask_to_segments_host",
    "segments_to_mask",
]
