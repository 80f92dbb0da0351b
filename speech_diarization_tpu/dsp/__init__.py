"""L0 — DSP frontend, all on-device (jnp) with static shapes.

Replaces the reference's host-side librosa/scipy/torchaudio frontend
(``anti_stick_diarize.py:29-61``, ``vad.py:9-16``, ``speech_encode.py:10-38``,
``gtcrn_wrap.py:50-99``) with jitted XLA ops; the fused log-mel filterbank also
has a Pallas MXU kernel (``ops/pallas/fused_fbank.py``).
"""
from .framing import frame_signal, num_frames
from .preprocess import preemphasis, remove_dc, preprocess_waveform
from .stft import stft, istft, sqrt_hann_window, hann_window
from .mel import mel_filterbank, log_mel_spectrogram, fbank_batch
from .resample import resample_poly_jax, resample_host
from .loudness import integrated_loudness, loudness_normalize
from .ola import overlap_add, ola_normalization

__all__ = [
    "frame_signal",
    "num_frames",
    "preemphasis",
    "remove_dc",
    "preprocess_waveform",
    "stft",
    "istft",
    "sqrt_hann_window",
    "hann_window",
    "mel_filterbank",
    "log_mel_spectrogram",
    "fbank_batch",
    "resample_poly_jax",
    "resample_host",
    "integrated_loudness",
    "loudness_normalize",
    "overlap_add",
    "ola_normalization",
]
