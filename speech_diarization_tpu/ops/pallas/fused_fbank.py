"""Fused framing + window + |DFT|^2 + mel + log Pallas kernel.

The log-mel frontend feeds every model in the zoo (SURVEY.md C5), so it is
the framework's hottest DSP op.  The jnp path (``dsp/mel.py``) materializes
the [N, 400] frame tensor in HBM (a 2.5x blow-up of the waveform) before the
DFT matmuls; this kernel instead keeps each block's waveform slice in VMEM
and runs the DFT + mel matmuls back-to-back on the MXU, writing only the
final [N, n_mels] log-mel rows to HBM.  HBM traffic drops from
(1 + 2.5 + 1.26 + 0.5)x to (1 + 0.5)x of the waveform size.

Mosaic-friendly framing: the waveform is viewed host-side as hop-sized rows
[B, rows, hop] (frame f starts exactly at row f).  A window of ``win``
samples spans k = ceil(win/hop) consecutive rows, so the windowed DFT
factorizes into k MXU dots with row-sliced, zero-padded DFT matrices:

    real[f, :] = sum_j (rows[f+j] * window[j*hop:(j+1)*hop]) @ cos[j*hop:(j+1)*hop, :]

— no reshapes or lane concatenations inside the kernel (Mosaic's
infer-vector-layout rejects [tile*hop] -> [tile, hop] shape casts; this
formulation needs none).  Matrices are lane-padded to multiples of 128 (MXU
tiles); padded DFT rows/columns are zero so they contribute nothing.

Grid: (batch, frame blocks).  Each program DMAs its [tile_n + k, hop] row
slice HBM→VMEM (blocks overlap by k rows, which BlockSpec index maps cannot
express — hence the manual async copy).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ...dsp.mel import _mel_filterbank_np
from ...dsp.stft import _dft_matrices


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=8)
def _padded_matrices(win: int, hop: int, n_mels: int, sample_rate: int,
                     f_min: float, f_max: float):
    """(window [1, k*HP], cos [k*HP, KP], msin [k*HP, KP], mel [KP, MP]) where
    HP = hop rounded up to the 128-lane tile (Mosaic requires 128-aligned
    lane extents).  Sample t of stream j lives at padded index j*HP + t;
    padded positions carry zero window/DFT rows, so they contribute
    nothing."""
    n_bins = win // 2 + 1
    k = -(-win // hop)
    hp = _round_up(hop, 128)
    kp = _round_up(n_bins, 128)
    mp = _round_up(n_mels, 128)
    cos_m, msin_m = _dft_matrices(win)
    win_fn = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)).astype(np.float32)
    cos_p = np.zeros((k * hp, kp), np.float32)
    sin_p = np.zeros((k * hp, kp), np.float32)
    window = np.zeros((1, k * hp), np.float32)
    for j in range(k):
        t0, t1 = j * hop, min((j + 1) * hop, win)
        cos_p[j * hp : j * hp + (t1 - t0), :n_bins] = cos_m[t0:t1]
        sin_p[j * hp : j * hp + (t1 - t0), :n_bins] = msin_m[t0:t1]
        window[0, j * hp : j * hp + (t1 - t0)] = win_fn[t0:t1]
    mel = _mel_filterbank_np(n_bins, f_min, f_max, n_mels, sample_rate)
    mel_p = np.zeros((kp, mp), np.float32)
    mel_p[:n_bins, :n_mels] = mel
    return window, cos_p, sin_p, mel_p


def _fbank_kernel(y_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref,
                  y_vmem, sem, *, tile_n: int, hp: int, k: int, eps: float):
    b = pl.program_id(0)
    i = pl.program_id(1)

    k_pad = _round_up(k, 8)  # sublane slices must be 8-aligned (Mosaic)
    dma = pltpu.make_async_copy(
        y_ref.at[b, pl.ds(i * tile_n, tile_n + k_pad), :], y_vmem, sem
    )
    dma.start()
    dma.wait()

    real = jnp.zeros((tile_n, cos_ref.shape[1]), jnp.float32)
    imag = jnp.zeros((tile_n, cos_ref.shape[1]), jnp.float32)
    for j in range(k):
        s = y_vmem[pl.ds(j, tile_n), :] * win_ref[0, pl.ds(j * hp, hp)][None, :]
        real += jnp.dot(s, cos_ref[pl.ds(j * hp, hp), :],
                        preferred_element_type=jnp.float32)
        imag += jnp.dot(s, sin_ref[pl.ds(j * hp, hp), :],
                        preferred_element_type=jnp.float32)
    power = real * real + imag * imag
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + eps)[None]


def fused_log_mel(
    y: jax.Array,
    sample_rate: int = 16000,
    n_mels: int = 80,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    f_min: float = 20.0,
    f_max: float | None = None,
    eps: float = 1e-6,
    tile_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """[T] or [B, T] waveform(s) -> [(B,) n_frames, n_mels] log-mel,
    matching ``dsp.mel.log_mel_spectrogram`` (center=True reflect padding)."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    win = int(sample_rate * win_ms / 1000.0)
    hop = int(sample_rate * hop_ms / 1000.0)
    f_max = f_max if f_max is not None else sample_rate / 2 - 100.0
    b, t = y.shape
    k = -(-win // hop)

    pad = win // 2
    yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_out = t // hop + 1  # center=True frame count

    tile_n = min(tile_n, _round_up(n_out, 8))
    n_blocks = -(-n_out // tile_n)
    rows_needed = n_blocks * tile_n + _round_up(k, 8)
    t_needed = rows_needed * hop
    if t_needed > yp.shape[-1]:
        yp = jnp.pad(yp, ((0, 0), (0, t_needed - yp.shape[-1])))
    else:
        yp = yp[:, :t_needed]
    hp = _round_up(hop, 128)
    y3 = yp.reshape(b, rows_needed, hop)
    if hp != hop:  # 128-lane alignment (zero lanes hit zero DFT rows)
        y3 = jnp.pad(y3, ((0, 0), (0, 0), (0, hp - hop)))

    window, cos_p, sin_p, mel_p = _padded_matrices(
        win, hop, n_mels, sample_rate, f_min, f_max
    )
    mp = mel_p.shape[1]

    kernel = partial(_fbank_kernel, tile_n=tile_n, hp=hp, k=k, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # waveform rows stay in HBM
            pl.BlockSpec(window.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_p.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_p.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_p.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, mp), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * tile_n, mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_n + _round_up(k, 8), hp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(y3, jnp.asarray(window), jnp.asarray(cos_p), jnp.asarray(sin_p),
      jnp.asarray(mel_p))
    out = out[:, :n_out, :n_mels]
    return out[0] if squeeze else out
