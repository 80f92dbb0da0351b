"""Fused framing + window + |DFT|^2 + mel + log Pallas kernel.

The log-mel frontend feeds every model in the zoo (SURVEY.md C5), so it is
the framework's hottest DSP op.  The jnp path (``dsp/mel.py``) materializes
the [N, 400] frame tensor in HBM (a 2.5x blow-up of the waveform) before the
DFT matmuls; this kernel instead keeps each block's waveform slice in VMEM,
builds frames with in-register shifted reshapes, and runs the two DFT matmuls
plus the mel matmul back-to-back on the MXU, writing only the final
[N, n_mels] log-mel rows to HBM.  HBM traffic drops from
(1 + 2.5 + 1.26 + 0.5)x to (1 + 0.5)x of the waveform size.

Matrices are lane-padded to multiples of 128 (MXU tiles); padded DFT columns
are zero so they contribute nothing to the mel projection.

Grid: one program per TILE_N frames.  Each program DMAs its overlapping
waveform slice HBM→VMEM (blocks overlap by win-hop samples, which BlockSpec
index maps cannot express — hence the manual async copy).
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
def _padded_matrices(win: int, n_mels: int, sample_rate: int,
                     f_min: float, f_max: float):
    """(window [1, win], cos [win, KP], msin [win, KP], mel [KP, MP])."""
    n_bins = win // 2 + 1
    kp = _round_up(n_bins, 128)
    mp = _round_up(n_mels, 128)
    cos_m, msin_m = _dft_matrices(win)
    cos_p = np.zeros((win, kp), np.float32)
    sin_p = np.zeros((win, kp), np.float32)
    cos_p[:, :n_bins] = cos_m
    sin_p[:, :n_bins] = msin_m
    mel = _mel_filterbank_np(n_bins, f_min, f_max, n_mels, sample_rate)
    mel_p = np.zeros((kp, mp), np.float32)
    mel_p[:n_bins, :n_mels] = mel
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)).astype(np.float32)
    return window[None, :], cos_p, sin_p, mel_p


def _fbank_kernel(y_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref,
                  y_vmem, sem, *, tile_n: int, win: int, hop: int, eps: float):
    i = pl.program_id(0)
    block_t = y_vmem.shape[1]
    start = i * (tile_n * hop)

    dma = pltpu.make_async_copy(
        y_ref.at[:, pl.ds(start, block_t)], y_vmem, sem
    )
    dma.start()
    dma.wait()

    # frames via k shifted reshapes: stream j covers samples
    # [j*hop + f*hop, j*hop + (f+1)*hop) of frame f
    k = -(-win // hop)
    streams = [
        y_vmem[0, pl.ds(j * hop, tile_n * hop)].reshape(tile_n, hop)
        for j in range(k)
    ]
    frames = jnp.concatenate(streams, axis=1)[:, :win]  # [tile_n, win]
    fw = frames * win_ref[0, :][None, :]

    real = jnp.dot(fw, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(fw, sin_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + eps)


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
    """[T] waveform -> [n_frames, n_mels] log-mel, matching
    ``dsp.mel.log_mel_spectrogram`` (center=True reflect padding)."""
    win = int(sample_rate * win_ms / 1000.0)
    hop = int(sample_rate * hop_ms / 1000.0)
    f_max = f_max if f_max is not None else sample_rate / 2 - 100.0
    t = y.shape[-1]

    pad = win // 2
    yp = jnp.pad(y, (pad, pad), mode="reflect")
    n_out = t // hop + 1  # center=True frame count

    n_blocks = -(-n_out // tile_n)
    k = -(-win // hop)
    block_t = tile_n * hop + (k - 1) * hop + hop  # slack for the k streams
    needed = (n_blocks - 1) * (tile_n * hop) + block_t
    if needed > yp.shape[-1]:
        yp = jnp.pad(yp, (0, needed - yp.shape[-1]))
    yp2 = yp[None, :]  # [1, T'] — 2D for TPU layouts

    window, cos_p, sin_p, mel_p = _padded_matrices(
        win, n_mels, sample_rate, f_min, f_max
    )
    mp = mel_p.shape[1]

    kernel = partial(_fbank_kernel, tile_n=tile_n, win=win, hop=hop, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # waveform stays in HBM
            pl.BlockSpec((1, win), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * tile_n, mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, block_t), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(yp2, jnp.asarray(window), jnp.asarray(cos_p), jnp.asarray(sin_p),
      jnp.asarray(mel_p))
    return out[:n_out, :n_mels]
