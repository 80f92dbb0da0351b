"""Dialog/effect/music separation pipeline with chunked ensemble application.

Capability mirror of ``dialog-demix.py``: stereo 44.1 kHz contract
(``dialog-demix.py:61-62``), ensemble mean over several separator weight sets
(``dialog-demix.py:66-71``), overlapped chunk application (the
``apply_model(overlap=0.8)`` analog), per-stem output trees
``music/ effect/ dialog/`` (``dialog-demix.py:113-119``), and an audio reader
that up-mixes mono / truncates to two channels (``dialog-demix.py:75-90`` —
including the intended-behavior fix for its broken resample call, SURVEY.md
§2.5 item 7).
"""
from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp.framing import frame_signal, num_frames
from ..dsp.ola import ola_normalization, overlap_add
from ..dsp.stft import hann_window
from ..io.audio import read_audio, write_wav
from ..io.walk import expand_audios
from ..models.demix import STEMS, DialogDemixer, Params
from ..utils.logging import get_logger

log = get_logger("demix")

DEMIX_SR = 44100


def demucs_style_read(source, target_sr: int = DEMIX_SR) -> tuple[np.ndarray, int]:
    """Stereo read: mono is duplicated, >2 channels truncated
    (``demucs_read_audio``, ``dialog-demix.py:75-90``)."""
    y, sr = read_audio(source, target_sr=target_sr, mono=False)
    if y.ndim == 1:
        y = y[None, :]
    if y.shape[0] == 1:
        y = np.repeat(y, 2, axis=0)
    if y.shape[0] > 2:
        y = y[:2]
    return y.astype(np.float32), sr


class EnsembleDemixer:
    """Mean-of-ensemble separator over overlapped chunks."""

    def __init__(
        self,
        param_sets: Sequence[Params] | None = None,
        model: DialogDemixer | None = None,
        chunk_s: float = 10.0,
        overlap: float = 0.25,
        n_models: int = 3,
        shifts: int = 1,
        max_shift_s: float = 0.5,
    ):
        self.model = model or DialogDemixer()
        if param_sets is None and model is None:
            # ported MVSEP-CDX23 HTDemucs checkpoints take precedence over
            # the trained U-Net: drop the three `97d170e1-*.th` files from
            # the reference release (dialog-demix.py:9-28) into weights/
            # (or point SDTPU_DEMUCS_CKPTS at them, ':'-separated) and the
            # faithful graph becomes the engine
            import os

            from ..utils.weights import WEIGHTS_ROOT

            env = os.environ.get("SDTPU_DEMUCS_CKPTS", "")
            ckpts = ([Path(p) for p in env.split(":") if p]
                     or sorted(WEIGHTS_ROOT.glob("*.th")))
            ckpts = [c for c in ckpts if c.exists()]
            if ckpts:
                from ..models.port_demucs import load_htdemucs

                loaded = [load_htdemucs(c) for c in ckpts]
                self.model = loaded[0][0]
                if any(m.manifest() != self.model.manifest()
                       for m, _ in loaded[1:]):
                    raise ValueError(
                        "demucs ensemble checkpoints disagree on architecture")
                param_sets = [p for _, p in loaded]
                log.info("demix: HTDemucs ensemble of %d ported checkpoints",
                         len(param_sets))
        if param_sets is None:
            from ..utils.weights import prefer_weights

            default = prefer_weights(("demix_mc.npz", "demix_synthetic.npz"))
            if model is None and default is not None:
                from ..train.recipes import load_demixer

                log.info("demix: using shipped trained weights %s "
                         "(ensemble of 1)", default)
                self.model, params = load_demixer(default)
                param_sets = [params]
            else:
                log.warning(
                    "demix: no weights given — RANDOM ensemble; stems will be "
                    "garbage. Train via train/recipes.train_demixer_synthetic "
                    "or port checkpoints.")
                param_sets = [
                    self.model.init(jax.random.PRNGKey(i)) for i in range(n_models)
                ]
        self.param_sets = list(param_sets)
        self.chunk_s = chunk_s
        self.overlap = overlap
        self.shifts = max(1, int(shifts))
        self.max_shift_s = max_shift_s
        self._fwd = jax.jit(self.model.apply)

    @property
    def instruments(self) -> tuple[str, ...]:
        return STEMS

    def separate(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        """[2, T] @44.1 kHz -> [3, 2, T] (ensemble mean, chunked OLA).

        With ``shifts > 1``, the Demucs shift-equivariance trick
        (``dialog-demix.py:66`` passes ``shifts=1`` to ``apply_model``): the
        input is offset by evenly-spread sub-``max_shift_s`` amounts, each
        shifted copy is separated, outputs are re-aligned and averaged —
        suppressing chunk-boundary artifacts the conv net is not
        shift-invariant to.
        """
        assert wav.ndim == 2 and wav.shape[0] == 2, "input must be [2, T] stereo"
        assert sample_rate == DEMIX_SR, "sample rate must be 44100"
        if self.shifts > 1:
            t = wav.shape[-1]
            max_shift = int(self.max_shift_s * sample_rate)
            offsets = [int(round(s * max_shift / self.shifts))
                       for s in range(self.shifts)]
            padded = np.pad(wav, ((0, 0), (max_shift, max_shift)))
            acc = None
            for off in offsets:
                shifted = padded[:, max_shift - off: 2 * max_shift - off + t]
                out = self._separate_once(shifted, sample_rate)
                out = out[:, :, off: off + t]
                acc = out if acc is None else acc + out
            return acc / self.shifts
        return self._separate_once(wav, sample_rate)

    def _separate_once(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        t = wav.shape[-1]
        chunk = int(self.chunk_s * sample_rate)
        hop = int(chunk * (1.0 - self.overlap))

        if t <= chunk:
            chunks = jnp.asarray(wav)[None]  # [1, 2, t]
            outs = [self._fwd(p, chunks)[0] for p in self.param_sets]
            return np.asarray(jnp.mean(jnp.stack(outs), axis=0))

        n = num_frames(t, chunk, hop, pad_tail=True)
        framed = frame_signal(jnp.asarray(wav), chunk, hop)  # [2, n, chunk]
        framed = jnp.transpose(framed, (1, 0, 2))  # [n, 2, chunk]

        acc = None
        for p in self.param_sets:
            sep = self._fwd(p, framed)  # [n, 3, 2, chunk]
            acc = sep if acc is None else acc + sep
        sep = acc / len(self.param_sets)

        window = hann_window(chunk, periodic=False) + 1e-3  # avoid zero edges
        den = ola_normalization(n, chunk, hop, window)
        t_pad = (n - 1) * hop + chunk
        out = np.zeros((3, 2, t_pad), dtype=np.float32)
        for s in range(3):
            for c in range(2):
                frames = sep[:, s, c, :] * window[None, :]
                out[s, c] = np.asarray(overlap_add(frames, hop) / den)
        return out[:, :, :t]


def separate_dialog(
    input_path: str | Path,
    output: str | Path | None = None,
    demixer: EnsembleDemixer | None = None,
) -> list[Path]:
    """Batch CLI behavior of ``separate_dialog`` (``dialog-demix.py:107-119``):
    walk audio files, separate, and write ``<out>/<instrument>/<file>`` trees."""
    audios, root = expand_audios(input_path)
    troot = Path(output) if output else root.with_name(f"{root.stem}-dialog")
    demixer = demixer or EnsembleDemixer()

    written: list[Path] = []
    for apath in audios:
        rel = apath.relative_to(root) if apath.is_relative_to(root) else apath.name
        wav, sr = demucs_style_read(apath)
        stems = demixer.separate(wav, sr)
        for name, stem in zip(demixer.instruments, stems):
            tpath = (troot / name / rel).with_suffix(".wav")
            tpath.parent.mkdir(parents=True, exist_ok=True)
            write_wav(tpath, stem, sr)
            written.append(tpath)
        log.info("separated %s -> %s", apath, troot)
    return written
