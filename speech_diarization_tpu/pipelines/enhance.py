"""Speech-enhancement pipelines: GTCRN streaming and windowed batch inference.

Capability mirror of the reference's two enhancement front-ends:
  * ``AudioEnhancer.enhance_audio`` (``gtcrn_wrap.py:37-153``) — STFT → GTCRN →
    iSTFT, with 360 s / 1 s-overlap Hann OLA chunking for long audio;
  * ``zip_enhance_imp`` (``zipenhancex.py:15-63``) — 2 s windows at 75 % hop,
    batched model forward, sqrt-Hann overlap-add with weight normalization and
    peak limiting.

TPU-first: chunks/windows are a batch dimension of ONE fixed-shape jitted
call (pad-and-trim), not a Python loop of individually launched forwards; the
overlap-add runs on device (``dsp/ola.py``).  The windowed path accepts any
``[B, L] -> [B, L]`` model, so GTCRN and ZipEnhancer-class nets share it.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp.framing import frame_signal, num_frames
from ..dsp.ola import ola_normalization, overlap_add
from ..dsp.stft import hann_window, istft_ri, sqrt_hann_window, stft_ri
from ..models.gtcrn import GTCRN, Params
from ..utils.logging import get_logger

log = get_logger("enhance")


class GtcrnEnhancer:
    """GTCRN wav→wav enhancement with long-audio chunked OLA."""

    def __init__(
        self,
        params: Params,
        n_fft: int = 512,
        hop: int = 256,
        chunk_s: float = 360.0,
        overlap_s: float = 1.0,
        sample_rate: int = 16000,
        batch_chunks: int = 4,
    ):
        self.net = GTCRN()
        self.params = params
        self.n_fft = n_fft
        self.hop = hop
        self.chunk_s = chunk_s
        self.overlap_s = overlap_s
        self.sample_rate = sample_rate
        self.batch_chunks = batch_chunks
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, wavs: jax.Array) -> jax.Array:
        """[B, T] -> [B, T]: STFT(sqrt-Hann, center) → GTCRN → iSTFT.
        Real-pair spectra throughout — no complex HLOs."""
        spec = stft_ri(wavs, self.n_fft, self.hop)
        enh = self.net.apply(self.params, spec)
        return istft_ri(enh, self.n_fft, self.hop, length=wavs.shape[-1])

    def __call__(self, y: jax.Array | np.ndarray) -> np.ndarray:
        """Enhance a [T] waveform of any length (host in/out)."""
        y = jnp.asarray(y)
        t = y.shape[-1]
        sr = self.sample_rate
        chunk = int(self.chunk_s * sr)
        if t <= chunk:
            return np.asarray(self._forward(y[None])[0])

        stride = int((self.chunk_s - self.overlap_s) * sr)
        n = num_frames(t, chunk, stride, pad_tail=True)
        needed = (n - 1) * stride + chunk
        ypad = jnp.pad(y, (0, needed - t))
        chunks = frame_signal(ypad, chunk, stride, pad_tail=False)  # [n, chunk]

        window = hann_window(chunk, periodic=False)
        outs = []
        bc = self.batch_chunks
        for i in range(0, n, bc):
            block = chunks[i : i + bc]
            if block.shape[0] < bc:
                block = jnp.pad(block, ((0, bc - block.shape[0]), (0, 0)))
            outs.append(self._forward(block))
        enh = jnp.concatenate(outs, axis=0)[:n] * window[None, :]

        num = overlap_add(enh, stride)
        den = ola_normalization(n, chunk, stride, window)
        return np.asarray((num / den)[:t])


def windowed_enhance(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    y: np.ndarray | jnp.ndarray,
    sample_rate: int = 16000,
    window_s: float = 2.0,
    hop_ratio: float = 0.75,
    batch_size: int = 64,
    peak_limit: float = 0.99,
) -> np.ndarray:
    """ZipEnhancer-style windowed batch enhancement with sqrt-Hann OLA.

    ``model_fn``: jitted ``[B, L] -> [B, L]`` denoiser.  Mirrors
    ``zip_enhance_imp`` (``zipenhancex.py:15-63``) with the loop replaced by
    fixed-shape batches and on-device scatter-free OLA.
    """
    y = jnp.asarray(y)
    t = y.shape[-1]
    l = int(window_s * sample_rate)
    hop = int(round(l * hop_ratio))

    n = num_frames(t, l, hop, pad_tail=True) if t > l else 1
    needed = (n - 1) * hop + l
    ypad = jnp.pad(y, (0, max(0, needed - t)))
    patches = frame_signal(ypad, l, hop, pad_tail=False)  # [n, L]

    outs = []
    for i in range(0, n, batch_size):
        block = patches[i : i + batch_size]
        pad_rows = batch_size - block.shape[0]
        if pad_rows:
            block = jnp.pad(block, ((0, pad_rows), (0, 0)))
        outs.append(model_fn(block))
    enh = jnp.concatenate(outs, axis=0)[:n]

    w = sqrt_hann_window(l, periodic=False)
    num = overlap_add(enh * w[None, :], hop)
    den = ola_normalization(n, l, hop, w)
    out = (num / den)[:t]

    peak = jnp.max(jnp.abs(out))
    out = jnp.where(peak > 1.0, out * (peak_limit / peak), out)
    return np.asarray(out)


def enhance_batch(
    root,
    backend: str = "gtcrn",
    params=None,
    suffix: str = "-enhanced",
    target_sr: int = 16000,
    **kwargs,
) -> list:
    """Directory batch enhancement with skip-if-done resume.

    Mirrors the batch CLIs of ``zipenhancex.main`` (``zipenhancex.py:199-212``:
    walk → skip existing outputs → enhance → write) and
    ``zipenhancer_pipe.main`` (``zipenhancer_pipe.py:151-159``: ``<stem>-ze``
    naming); outputs land in a sibling ``<root>-enhanced`` tree.
    """
    from pathlib import Path

    from ..io.audio import read_audio, write_wav
    from ..io.walk import expand_audios

    audios, proot = expand_audios(root)
    troot = proot.with_name(f"{proot.stem}{suffix}")
    fn = make_enhance_fn(backend, params=params, **kwargs)

    written = []
    for apath in audios:
        rel = apath.relative_to(proot) if apath.is_relative_to(proot) else Path(apath.name)
        tpath = (troot / rel).with_suffix(".wav")
        if tpath.exists():  # resume: skip finished files (zipenhancex.py:207-209)
            continue
        y, sr = read_audio(apath, target_sr=target_sr, mono=True)
        out = np.asarray(fn(jnp.asarray(y)))
        tpath.parent.mkdir(parents=True, exist_ok=True)
        write_wav(tpath, out, sr)
        written.append(tpath)
        log.info("enhanced %s -> %s", apath, tpath)
    return written


def default_weights_path(backend: str):
    """Shipped default checkpoint for ``backend`` (None when nothing ships).
    Lets callers that auto-enable enhancement verify a TRAINED net exists
    instead of silently engaging a random-weight 'denoiser'."""
    from ..utils.weights import prefer_weights

    return prefer_weights({
        "gtcrn": ("gtcrn_mc.npz", "gtcrn_synthetic.npz"),
        "zipenhancer": ("zipenhancer_mc.npz", "zipenhancer_synthetic.npz"),
        "demix-dialog": ("demix_mc.npz", "demix_synthetic.npz"),
    }.get(backend, ()))


def make_enhance_fn(backend: str, params=None, weights=None, **kwargs) -> Callable:
    """Factory for the pipeline's ``enhance_fn`` slot (the latent
    enhancement-before-diarization stage the reference left commented out at
    ``diarization_baseline.py:333-338`` — first-class here).

    ``weights``: checkpoint path override (.npz) for any backend; wins over
    the shipped default but loses to an explicit ``params`` tree."""
    if weights is not None and params is None and backend != "demix-dialog":
        from ..models.port import load_params_npz

        log.info("%s: loading weights override %s", backend, weights)
        params = load_params_npz(weights)
    if backend == "gtcrn":
        if params is None:
            from pathlib import Path

            from ..models.port import load_params_npz

            # prefer the multi-condition retrain (babble/reverb beds): it
            # beats the r1 synthetic weights on BOTH noise families
            # (r1-family 8.77 vs 8.29 dB SI-SNR, mc-family 11.3 vs 8.29)
            default = default_weights_path("gtcrn")
            if default is not None:
                log.info("gtcrn: using shipped trained weights %s", default)
                params = load_params_npz(default)
            else:
                log.warning(
                    "gtcrn: no weights given and none shipped — using RANDOM "
                    "weights; 'enhanced' audio will be garbage. Port the DNS3 "
                    "checkpoint (models/port.load_gtcrn_checkpoint) or train "
                    "(train/recipes.train_gtcrn_synthetic).")
                from ..models.gtcrn import gtcrn_init_params

                params = gtcrn_init_params(jax.random.PRNGKey(0))
        enhancer = GtcrnEnhancer(params, **kwargs)
        return lambda y: jnp.asarray(enhancer(y))
    if backend == "zipenhancer":
        from ..models.zipenhancer import ZipEnhancerModel

        model = ZipEnhancerModel()
        if params is None:
            from ..models.port import load_params_npz

            # same preference list as default_weights_path — the pipeline's
            # trained-weights guard and this loader must agree
            default = default_weights_path("zipenhancer")
            if default is not None:
                log.info("zipenhancer: using shipped trained weights %s",
                         default)
                params = load_params_npz(default)
            else:
                log.warning(
                    "zipenhancer: no weights given and none shipped — using "
                    "RANDOM weights; 'enhanced' audio will be garbage. Train "
                    "via train/recipes.train_zipenhancer_synthetic or port a "
                    "checkpoint.")
                params = model.init(jax.random.PRNGKey(0))
        fwd = jax.jit(partial(model.apply, params))
        return lambda y: jnp.asarray(windowed_enhance(fwd, y, **kwargs))
    if backend == "zipenhancer-ref":
        # the published ZipEnhancer graph (models/zipenhancer_ref.py) — the
        # backend the real ModelScope artifact loads into
        # (iic/speech_zipenhancer_ans_multiloss_16k_base,
        # /root/reference/zipenhancer_pipe.py:119-125)
        from ..models.zipenhancer_ref import ZipEnhancerRef

        model = ZipEnhancerRef()
        if params is None:
            log.warning(
                "zipenhancer-ref: no checkpoint given — RANDOM weights; "
                "'enhanced' audio will be garbage. Port the ModelScope "
                "artifact via models/port_zipenhancer.load_zipenhancer_modelscope.")
            params = model.init(jax.random.PRNGKey(0))
        fwd = jax.jit(partial(model.apply, params))
        return lambda y: jnp.asarray(windowed_enhance(fwd, y, **kwargs))
    if backend == "demix-dialog":
        # SEPARATION front-end: dialog stem of the demixer ensemble.  Under
        # competing speech (babble) denoisers cannot help — they preserve
        # the interfering *speech* — but source separation can: measured
        # 2026-08-19 (scripts/exp_babble_frontend.py, 60 s x 3/SNR):
        # babble@5 dB DER 26.8% -> 14.6%, babble@15 dB 5.4% -> 4.9%, while
        # ZipEnhancer-as-frontend made both WORSE (59%/12% — it distorts
        # speaker identity).  Opt-in (EnhanceConfig.backend='demix-dialog');
        # 16 kHz mono -> 44.1 kHz stereo -> dialog stem -> 16 kHz.
        from ..dsp.resample import resample_host
        from .demix import DEMIX_SR, EnsembleDemixer

        # honor weight overrides for this backend too (they used to be
        # silently ignored): a weights path reconstructs the U-Net geometry
        # from the npz meta; an explicit params tree rides the default net
        if weights is not None:
            from ..train.recipes import load_demixer

            log.info("demix-dialog: loading weights override %s", weights)
            mdl, p = load_demixer(weights)
            dmx = EnsembleDemixer(param_sets=[p], model=mdl, **kwargs)
        elif params is not None:
            dmx = EnsembleDemixer(param_sets=[params], **kwargs)
        else:
            dmx = EnsembleDemixer(**kwargs)
        sr = 16000

        def fe(y):
            yn = np.asarray(y, np.float32)
            up = resample_host(yn, sr, DEMIX_SR)
            stems = dmx.separate(np.stack([up, up]), DEMIX_SR)
            dialog = stems[2].mean(axis=0)
            out = resample_host(dialog, DEMIX_SR, sr).astype(np.float32)
            if out.shape[-1] < yn.shape[-1]:
                out = np.pad(out, (0, yn.shape[-1] - out.shape[-1]))
            return jnp.asarray(out[: yn.shape[-1]])

        return fe
    raise ValueError(f"unknown enhancement backend: {backend}")
