#!/usr/bin/env python
"""DCE-proof fbank decomposition + conv1d-DFT alternative (round 5).

The first stage probe (bench_fbank_stages.py) was partly an XLA-DCE
artifact: a sum-reduced probe output lets XLA algebraically collapse
unwindowed framing (sum over frames = weighted sum over the signal), so
"pad+frame" read 0.002 ms while "…+window" read 1.74 ms.  Here every
stage output is wrapped in ``abs`` before the chained-scan reduction —
XLA cannot eliminate the stage — and a conv1d formulation of the
windowed DFT is measured against the frame+einsum one:

  power_k(n) = conv(y, w ⊙ cos_k, stride=hop)^2 + conv(y, w ⊙ sin_k)^2

i.e. one strided conv with 2*n_bins output channels and kernel n_fft —
implicit framing on the MXU, the [n, n_fft] framed tensor never exists.

    python scripts/bench_fbank_stages2.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SR = 16000


def amortized(fn, seg, iters=4, K=16, label=""):
    import jax
    import jax.numpy as jnp

    def chained(seg0):
        def body(carry, _):
            o = fn(carry)
            # abs defeats algebraic elimination of linear stages
            dep = (jnp.sum(jnp.abs(o)) * jnp.float32(1e-12)).astype(carry.dtype)
            return carry + dep, None

        c, _ = jax.lax.scan(body, seg0, None, length=K)
        return c

    fnK = jax.jit(chained)
    jax.block_until_ready(fnK(seg))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fnK(seg))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label}: {best * 1000:.3f} ms", flush=True)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from speech_diarization_tpu.dsp.framing import frame_signal
    from speech_diarization_tpu.dsp.mel import _dft_matrices, mel_filterbank
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)
    win, hop, wpc = 2 * SR, SR // 10, 600
    margin = 4 * SR
    span = 2 * margin + (wpc - 1) * hop + win
    seg = jnp.asarray(
        np.random.default_rng(0).standard_normal(span).astype(np.float32))

    n_fft, mhop = 400, 160
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
              ).astype(np.float32)
    cos_m, msin_m = _dft_matrices(n_fft)
    cw = jnp.asarray(cos_m * window[:, None])       # [n_fft, n_bins]
    sw = jnp.asarray(msin_m * window[:, None])
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, 20.0, SR / 2 - 100.0,
                                    80, SR))

    def pad(y):
        return jnp.pad(y[None], ((0, 0), (n_fft // 2, n_fft // 2)),
                       mode="reflect")

    def frames_(y):
        return frame_signal(pad(y), n_fft, mhop, pad_tail=False)

    def dft_real(y):
        return jnp.einsum("bnt,tk->bnk", frames_(y), cw)

    def power(y):
        f = frames_(y)
        real = jnp.einsum("bnt,tk->bnk", f, cw)
        imag = jnp.einsum("bnt,tk->bnk", f, sw)
        return real * real + imag * imag

    def mel(y):
        return jnp.einsum("bnk,km->bnm", power(y), fb)

    def full(y):
        return jnp.log(mel(y) + 1e-6)

    # conv1d-DFT: one strided conv, implicit framing
    wconv = jnp.concatenate([cw, sw], axis=1).T[:, None, :]  # [2K, 1, n_fft]

    def conv_power(y):
        x = pad(y)[:, None, :]                                # [1, 1, T]
        o = lax.conv_general_dilated(
            x, wconv, window_strides=(mhop,), padding="VALID")  # [1, 2K, n]
        k = o.shape[1] // 2
        return (o[:, :k] ** 2 + o[:, k:] ** 2).transpose(0, 2, 1)

    def conv_full(y):
        return jnp.log(jnp.einsum("bnk,km->bnm", conv_power(y), fb) + 1e-6)

    amortized(frames_, seg, label="frames(abs)")
    amortized(dft_real, seg, label="frames+dft_real")
    amortized(power, seg, label="frames+dft+power")
    amortized(mel, seg, label="+mel")
    amortized(full, seg, label="full log-mel (einsum)")
    amortized(conv_power, seg, label="conv-dft power")
    amortized(conv_full, seg, label="full log-mel (conv)")
    # parity
    a = np.asarray(jax.jit(full)(seg))
    b = np.asarray(jax.jit(conv_full)(seg))
    n = min(a.shape[1], b.shape[1])
    print("conv-vs-einsum max abs diff:",
          float(np.abs(a[:, :n] - b[:, :n]).max()))


if __name__ == "__main__" and "--blocked" not in sys.argv:
    main()


def blocked_variant():
    """Blocked DFT: frame i (480-padded) = blocks i, i+1, i+2 of 160
    samples, so real = sum_j blocks[j:j+n] @ W480[160j:160j+160] — three
    matmuls over CONTIGUOUS slices of the block-reshaped signal.  The
    framed tensor never exists and no concat/slice feeds the matmul."""
    import jax
    import jax.numpy as jnp

    from speech_diarization_tpu.dsp.mel import _dft_matrices, mel_filterbank
    from speech_diarization_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(ROOT)
    win, hop, wpc = 2 * SR, SR // 10, 600
    margin = 4 * SR
    span = 2 * margin + (wpc - 1) * hop + win
    seg = jnp.asarray(
        np.random.default_rng(0).standard_normal(span).astype(np.float32))

    n_fft, mhop = 400, 160
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
              ).astype(np.float32)
    cos_m, msin_m = _dft_matrices(n_fft)
    cw = np.zeros((3 * mhop, cos_m.shape[1]), np.float32)
    sw = np.zeros((3 * mhop, cos_m.shape[1]), np.float32)
    cw[:n_fft] = cos_m * window[:, None]
    sw[:n_fft] = msin_m * window[:, None]
    Wc = [jnp.asarray(cw[i * mhop:(i + 1) * mhop]) for i in range(3)]
    Ws = [jnp.asarray(sw[i * mhop:(i + 1) * mhop]) for i in range(3)]
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, 20.0, SR / 2 - 100.0,
                                    80, SR))

    def blocked_full(y):
        yp = jnp.pad(y[None], ((0, 0), (n_fft // 2, n_fft // 2)),
                     mode="reflect")
        t = yp.shape[1]
        n = (t - n_fft) // mhop + 1
        nb = n + 2
        # zero-pad to n+2 whole blocks: the padded samples only ever meet
        # the ZERO rows 400..479 of W480, so the result is exact
        yp = jnp.pad(yp, ((0, 0), (0, max(0, nb * mhop - t))))
        blocks = yp[:, :nb * mhop].reshape(1, nb, mhop)
        real = sum(jnp.einsum("bnt,tk->bnk", blocks[:, j:j + n], Wc[j])
                   for j in range(3))
        imag = sum(jnp.einsum("bnt,tk->bnk", blocks[:, j:j + n], Ws[j])
                   for j in range(3))
        power = real * real + imag * imag
        return jnp.log(jnp.einsum("bnk,km->bnm", power, fb) + 1e-6)

    amortized(blocked_full, seg, label="full log-mel (blocked)")
    from speech_diarization_tpu.dsp.mel import log_mel_spectrogram

    a = np.asarray(jax.jit(lambda y: log_mel_spectrogram(y[None]))(seg))[0]
    b = np.asarray(jax.jit(blocked_full)(seg))[0]
    n = min(a.shape[0], b.shape[0])
    print("blocked-vs-current max abs diff:",
          float(np.abs(a[:n] - b[:n]).max()))


if __name__ == "__main__" and "--blocked" in sys.argv:
    blocked_variant()
