"""Recursive audio discovery — the ``expand_audios`` helper the reference
copies three times (``diarization_baseline.py:273-280``, ``zipenhancex.py:170-178``,
``dialog-demix.py:93-104``), unified once."""
from __future__ import annotations

from pathlib import Path

AUDIO_EXTS = {".wav", ".flac", ".mp3", ".m4a", ".ogg", ".opus", ".aac", ".mka", ".webm"}


def expand_audios(root: str | Path) -> tuple[list[Path], Path]:
    """File -> ([file], parent); directory -> (sorted audio files under it, root)."""
    root = Path(root)
    if root.is_file():
        root = root.resolve()
        return [root], root.parent
    audios = sorted(
        p for p in root.rglob("*.*")
        if p.is_file() and p.suffix.lower() in AUDIO_EXTS
    )
    return audios, root
