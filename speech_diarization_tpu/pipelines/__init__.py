"""L3 — end-to-end pipelines (SURVEY.md layer map L3).

  * :mod:`diarize` — the flagship anti-stick pipeline
    (``anti_stick_diarize.diarize``, ``anti_stick_diarize.py:493-560``).
  * :mod:`baseline` — the batch Diarizer with stems export
    (``diarization_baseline.Diarizer``, ``diarization_baseline.py:283-346``).
  * :mod:`diagnostic` — the research harness with whitening/AS-Norm/VBx
    (``diar_diag.main``, ``diar_diag.py:297-433``).
  * :mod:`enhance` — GTCRN / ZipEnhancer-class chunked-OLA enhancement
    (``gtcrn_wrap.py``, ``zipenhancex.py``).
  * :mod:`demix` — dialog/effect/music separation (``dialog-demix.py``).
"""
from .diarize import DiarizationPipeline, DiarizationResult, diarize

__all__ = ["DiarizationPipeline", "DiarizationResult", "diarize"]
