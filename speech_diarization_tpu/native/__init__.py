"""ctypes bindings for the native audio runtime (``native/audioio.cpp``).

Builds the shared library on first use (g++, cached next to the source) and
exposes numpy-facing wrappers.  Every entry point has a pure-numpy fallback,
so the framework works without a toolchain; with it, host-side decode/
resample/framing run multi-threaded (OpenMP) while the TPU computes.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from math import gcd
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "audioio.cpp"
_LIB = _SRC.with_name("libsdtpu_audioio.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
                     str(_SRC), "-o", str(_LIB)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.sdtpu_decode_pcm.restype = ctypes.c_int
            lib.sdtpu_resample_poly.restype = ctypes.c_int
            lib.sdtpu_frame.restype = ctypes.c_int
            lib.sdtpu_frame_rms_db.restype = ctypes.c_int
            lib.sdtpu_num_threads.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return int(lib.sdtpu_num_threads()) if lib else 1


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def decode_pcm(raw: bytes, channels: int, width: int) -> np.ndarray:
    """Interleaved PCM bytes -> float32 mono [T]."""
    n_frames = len(raw) // (channels * width)
    lib = _load()
    if lib is None:
        # numpy fallback mirrors io/audio.read_wav
        from ..io.audio import read_wav  # noqa: F401 (same scaling rules)

        buf = np.frombuffer(raw, dtype=np.uint8)[: n_frames * channels * width]
        if width == 2:
            data = buf.view("<i2").astype(np.float32) / 32768.0
        elif width == 4:
            data = buf.view("<i4").astype(np.float32) / 2147483648.0
        elif width == 1:
            data = (buf.astype(np.float32) - 128.0) / 128.0
        else:
            a = buf.reshape(-1, 3)
            x = (a[:, 0].astype(np.int32) | (a[:, 1].astype(np.int32) << 8)
                 | (a[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x)
            data = x.astype(np.float32) / float(1 << 23)
        return data.reshape(-1, channels).mean(axis=1).astype(np.float32)
    src = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty(n_frames, dtype=np.float32)
    rc = lib.sdtpu_decode_pcm(_ptr(src), ctypes.c_int64(n_frames),
                              ctypes.c_int(channels), ctypes.c_int(width), _ptr(out))
    if rc != 0:
        raise RuntimeError(f"sdtpu_decode_pcm failed: {rc}")
    return out


def resample_poly(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Native polyphase resampling with the shared scipy-default filter."""
    from ..dsp.resample import _poly_filter, resample_host

    if orig_sr == target_sr:
        return np.asarray(y, dtype=np.float32)
    lib = _load()
    if lib is None:
        return resample_host(y, orig_sr, target_sr)
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    h = _poly_filter(up, down).astype(np.float32)
    x = np.ascontiguousarray(y, dtype=np.float32)
    ny = -(-x.shape[-1] * up // down)
    out = np.empty(ny, dtype=np.float32)
    rc = lib.sdtpu_resample_poly(_ptr(x), ctypes.c_int64(x.shape[-1]), _ptr(h),
                                 ctypes.c_int(len(h)), ctypes.c_int(up),
                                 ctypes.c_int(down), _ptr(out), ctypes.c_int64(ny))
    if rc != 0:
        raise RuntimeError(f"sdtpu_resample_poly failed: {rc}")
    return out


def frame(y: np.ndarray, win: int, hop: int) -> np.ndarray:
    """Dense [n_frames, win] framing with tail zero-pad (host side)."""
    from ..dsp.framing import num_frames

    x = np.ascontiguousarray(y, dtype=np.float32)
    n = num_frames(x.shape[-1], win, hop, pad_tail=True)
    lib = _load()
    if lib is None:
        out = np.zeros((n, win), dtype=np.float32)
        for f in range(n):
            seg = x[f * hop : f * hop + win]
            out[f, : len(seg)] = seg
        return out
    out = np.empty((n, win), dtype=np.float32)
    rc = lib.sdtpu_frame(_ptr(x), ctypes.c_int64(x.shape[-1]), ctypes.c_int(win),
                         ctypes.c_int(hop), _ptr(out), ctypes.c_int64(n))
    if rc != 0:
        raise RuntimeError(f"sdtpu_frame failed: {rc}")
    return out


def frame_rms_db(y: np.ndarray, win: int, hop: int) -> np.ndarray:
    """Per-frame RMS (dB) prescan — cheap host-side silence skipping."""
    from ..dsp.framing import num_frames

    x = np.ascontiguousarray(y, dtype=np.float32)
    n = num_frames(x.shape[-1], win, hop, pad_tail=True)
    lib = _load()
    if lib is None:
        fr = frame(x, win, hop)
        return (10.0 * np.log10(np.mean(fr * fr, axis=1) + 1e-10)).astype(np.float32)
    out = np.empty(n, dtype=np.float32)
    rc = lib.sdtpu_frame_rms_db(_ptr(x), ctypes.c_int64(x.shape[-1]),
                                ctypes.c_int(win), ctypes.c_int(hop),
                                _ptr(out), ctypes.c_int64(n))
    if rc != 0:
        raise RuntimeError(f"sdtpu_frame_rms_db failed: {rc}")
    return out
