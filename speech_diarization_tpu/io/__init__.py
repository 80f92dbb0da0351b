"""L4/L6 — audio codecs, export writers, stem extraction, file walking."""
from .audio import read_audio, write_wav, read_wav
from .writers import write_rttm, save_json, save_srt, save_csv, relabel_speakers
from .stems import extract_speaker_stems
from .walk import expand_audios

__all__ = [
    "read_audio",
    "write_wav",
    "read_wav",
    "write_rttm",
    "save_json",
    "save_srt",
    "save_csv",
    "relabel_speakers",
    "extract_speaker_stems",
    "expand_audios",
]
