"""The flagship anti-stick diarization pipeline, TPU-first.

Stage mirror of ``anti_stick_diarize.diarize`` (``anti_stick_diarize.py:493-560``):
read → loudness-norm/DC/pre-emphasis → VAD → SCD split → segment embeddings →
clustering → conservative merge → frame reassignment → adjacency merge.

TPU-first restructuring (SURVEY.md §7.1):
  * preprocessing + VAD probabilities + the dense window-embedding grid are
    jitted device passes over fixed-shape chunks — one compiled program per
    stage for any file length, no per-segment CUDA launches;
  * SCD, segment embeddings and reassignment all consume the SAME [W, D]
    window-embedding grid (computed once), instead of the reference's three
    separate embedding loops (its hottest path, SURVEY.md §3.1);
  * clustering defaults to on-device spectral (+ eigengap); HDBSCAN/AHC remain
    as host escape hatches;
  * the conservative merge takes real embeddings (fixing the reference's
    label-array bug, SURVEY.md §2.5 item 1) and its outputs are reused, not
    re-encoded.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from .. import cluster as cluster_mod
from ..config import DiarizationConfig
from ..dsp.loudness import loudness_normalize
from ..io.audio import read_audio
from ..models.ecapa import EcapaModel
from ..models.vad import VadModel, energy_vad_probs
from ..segment import (
    conservative_merge,
    embed_segments_bucketed,
    embed_windows,
    embed_windows_streaming,
    frame_energy_db_chunk,
    frame_reassign,
    merge_adjacent,
    scd_split,
    segment_embeddings_from_grid,
    vad_segments_from_probs,
    window_starts,
)
from ..types import Segment, SegmentArray
from ..utils.logging import get_logger, stage_timer
from .chunking import chunked_framewise

log = get_logger("diarize")


@dataclass
class DiarizationResult:
    segments: SegmentArray
    vad_segments: SegmentArray
    num_speakers: int
    diagnostics: dict[str, Any] = field(default_factory=dict)

    def to_segments(self) -> list[Segment]:
        return self.segments.to_segments()


class DiarizationPipeline:
    """Configurable wav→segments pipeline.

    Args:
        cfg: unified config (defaults = reference defaults where they exist).
        encode_fn: ``[B, T] -> [B, D]`` embedding function (jitted inside).
            Defaults to a seed-0 ECAPA-TDNN (weights portable via models/port).
        vad_probs_fn: ``[T_chunk] -> [F]`` frame-probability function.
            Defaults to the deterministic energy VAD; pass a neural
            ``VadModel`` closure for the Silero-class backend.
    """

    def __init__(
        self,
        cfg: DiarizationConfig | None = None,
        encode_fn: Callable | None = None,
        vad_probs_fn: Callable | None = None,
        enhance_fn: Callable | None = None,
        encoder: tuple | None = None,
    ):
        self.cfg = cfg or DiarizationConfig()
        sr = self.cfg.audio.sample_rate

        # (model, params) pair — enables the streaming trunk-shared grid
        # (segment/embed.embed_windows_streaming); a bare encode_fn closure
        # can only run the windowed grid.
        self._grid_model, self._grid_params = encoder or (None, None)
        if encode_fn is None and encoder is not None:
            model, params = encoder
            encode_fn = jax.jit(partial(model.encode_batch, params))
        if encode_fn is None:
            from pathlib import Path

            from ..utils.weights import ENCODER_PREFERENCE, prefer_weights

            # streaming-trained weights first: they engage the trunk-shared
            # grid under grid_backend='auto' (same DER, ~10x less trunk work)
            default = prefer_weights(ENCODER_PREFERENCE)
            if default is not None:
                from ..train.recipes import load_speaker_encoder

                log.info("encoder: using shipped synthetic-trained weights %s",
                         default)
                model, params = load_speaker_encoder(default)
            else:
                log.warning(
                    "no encode_fn given and %s missing: falling back to a "
                    "RANDOM-weight ECAPA — speaker labels will be meaningless. "
                    "Port a checkpoint (models/port_ecapa.load_ecapa_speechbrain) "
                    "or train one (train/recipes.train_speaker_encoder_synthetic).",
                    default,
                )
                model = EcapaModel()
                params = model.init(jax.random.PRNGKey(0))
            self._grid_model, self._grid_params = model, params
            encode_fn = jax.jit(partial(model.encode_batch, params))
        self.encode_fn = encode_fn

        if vad_probs_fn is None:
            vad_probs_fn = jax.jit(
                partial(
                    energy_vad_probs,
                    sample_rate=sr,
                    win_ms=self.cfg.vad.win_ms,
                    hop_ms=self.cfg.vad.hop_ms,
                )
            )
        self.vad_probs_fn = vad_probs_fn
        if enhance_fn is None and self.cfg.enhance.enabled:
            # the enhancement-before-diarization stage the reference left
            # commented out (diarization_baseline.py:333-338) — first-class here
            from .enhance import default_weights_path, make_enhance_fn

            e = self.cfg.enhance
            if e.weights is None and default_weights_path(e.backend) is None:
                # default-on config, nothing trained shipped: random-weight
                # 'denoising' is worse than none — drop the stage loudly
                log.warning(
                    "enhance: enabled but no trained %s weights ship — "
                    "stage disabled (pass EnhanceConfig.weights to force)",
                    e.backend)
            else:
                if e.backend == "gtcrn":
                    kwargs = {"chunk_s": e.chunk_s, "overlap_s": e.overlap_s}
                elif e.backend == "demix-dialog":
                    kwargs = {}
                else:
                    kwargs = {"window_s": e.window_s, "hop_ratio": e.hop_ratio,
                              "batch_size": e.batch_size}
                enhance_fn = make_enhance_fn(e.backend, weights=e.weights,
                                             **kwargs)
        self.enhance_fn = enhance_fn

    # ------------------------------------------------------------------ io --
    _PAD_BUCKET_S = 60.0  # pad to multiples of this so jit compiles per bucket

    def _preprocess_device(self, y: jnp.ndarray, n_valid: jnp.ndarray, sr: int,
                           scale: jnp.ndarray | float = 1.0):
        """One fused jitted pass: loudness norm + DC + pre-emphasis + clip.
        ``y`` is zero-padded to a bucket length; zeros don't pass the BS.1770
        gate (so the gain is unchanged) and the DC mean uses ``n_valid``.
        int16 input (the quantized-upload path) is dequantized here on
        device — the host→device link is the scarce resource, not the VPU.
        ``scale`` undoes the host-side peak normalization applied before
        quantization (see :meth:`_quantize_host`)."""
        cfg = self.cfg.audio
        if y.dtype == jnp.int16:
            y = y.astype(jnp.float32) * (jnp.float32(scale) / 32767.0)
        if cfg.target_lufs is not None:
            y = loudness_normalize(y, sr, cfg.target_lufs)
        if cfg.remove_dc:
            y = y - jnp.sum(y) / n_valid
        if cfg.preemphasis is not None:
            from ..dsp.preprocess import preemphasis

            y = preemphasis(y, cfg.preemphasis)
        return jnp.clip(y, -0.99, 0.99)

    @staticmethod
    def _quantize_host(y: np.ndarray, t_pad: int) -> tuple[np.ndarray, float]:
        """Pad to the jit bucket and quantize f32 → int16 on host.  The
        waveform is by far the largest host→device transfer (38 MB/f32 for
        10 min) and the axon tunnel's transfer path degrades ~30x once any
        non-trivial program has run in the process (see STATUS.md), so
        halving the bytes halves the dominant per-file upload cost.

        The signal is scaled to its own peak before quantizing (returned as
        ``scale``; the device dequant multiplies it back), so quiet or
        float/24-bit sources keep the full 16-bit resolution and samples
        beyond ±1.0 are preserved rather than hard-clipped — the absolute
        level is restored on device before loudness normalization."""
        t = y.shape[-1]
        peak = float(np.max(np.abs(y))) if t else 0.0
        scale = peak if peak > 1e-6 else 1.0
        out = np.zeros(t_pad, np.int16)
        out[:t] = np.clip(y * (32767.0 / scale), -32768.0, 32767.0).astype(np.int16)
        return out, scale

    def prefetch(self, source) -> tuple[jnp.ndarray, int, int, float]:
        """Host decode + bucket pad + async device upload (``device_put``
        returns immediately), so a corpus worker can overlap file i+1's
        upload with file i's compute.  Returns (device_wave, n_valid, sr,
        scale) — feed the tuple back through ``__call__``/``load``."""
        cfg = self.cfg.audio
        y, sr = read_audio(source, target_sr=cfg.sample_rate, mono=True)
        t = y.shape[-1]
        bucket = int(self._PAD_BUCKET_S * sr)
        t_pad = max(bucket, -(-t // bucket) * bucket)
        q, scale = self._quantize_host(y, t_pad)
        yd = jax.device_put(q)
        return yd, t, sr, scale

    def load(self, source) -> tuple[jnp.ndarray, int]:
        y, _vad_wave, sr = self._load_waves(source)
        return y, sr

    def _load_waves(self, source) -> tuple[jnp.ndarray, jnp.ndarray, int]:
        """-> (wave, vad_wave, sr).  ``vad_wave`` differs from ``wave`` only
        under ``EnhanceConfig.scope == 'vad'``: the VAD then sees the
        denoised signal while embeddings keep the raw one."""
        cfg = self.cfg.audio
        if isinstance(source, tuple) and len(source) == 4 and isinstance(
                source[0], jax.Array):
            yd, t, sr, scale = source  # prefetched
        else:
            y, sr = read_audio(source, target_sr=cfg.sample_rate, mono=True)
            t = y.shape[-1]
            bucket = int(self._PAD_BUCKET_S * sr)
            t_pad = max(bucket, -(-t // bucket) * bucket)
            q, scale = self._quantize_host(y, t_pad)
            yd = jnp.asarray(q)
        yd_enh = None
        if self.enhance_fn is not None:
            scope = self.cfg.enhance.scope
            engage = True
            if scope == "auto":
                snr = self._estimate_snr_db(yd, t)
                self._last_snr_db = snr
                engage = snr < self.cfg.enhance.auto_snr_db
                log.info("enhance auto-scope: est SNR %.1f dB (thr %.1f) "
                         "-> %s", snr, self.cfg.enhance.auto_snr_db,
                         "denoise for VAD" if engage else "skip")
            if engage:
                if yd.dtype == jnp.int16:
                    yd = yd.astype(jnp.float32) * (scale / 32767.0)
                fe = self.enhance_fn
                ecfg = self.cfg.enhance
                if (scope == "auto" and ecfg.auto_route_demix
                        and ecfg.backend != "demix-dialog"
                        and getattr(self, "_last_floor_hf_frac", 1.0)
                        < ecfg.babble_floor_hf_frac):
                    # speech-shaped noise floor = competing speech: denoisers
                    # preserve the interfering speech (and distort speaker
                    # identity) — route to the SEPARATION front-end instead
                    # (full scope, the config that halved babble@5 dB DER)
                    dfe = self._demix_frontend()
                    if dfe is not None:
                        log.info(
                            "enhance auto-route: floor hf-frac %.3f < %.3f "
                            "-> competing speech; demix-dialog front-end",
                            self._last_floor_hf_frac,
                            ecfg.babble_floor_hf_frac)
                        yd = dfe(yd)
                        fe = None
                if fe is not None:
                    yd_enh = fe(yd)
                    if scope == "full":
                        yd = yd_enh
                        yd_enh = None
        if not hasattr(self, "_preprocess_jit"):
            self._preprocess_jit = jax.jit(
                self._preprocess_device, static_argnames=("sr",)
            )
        yd = self._preprocess_jit(yd, jnp.float32(t), sr, jnp.float32(scale))
        if yd_enh is None:
            return yd[:t], yd[:t], sr
        yd_enh = self._preprocess_jit(yd_enh, jnp.float32(t), sr,
                                      jnp.float32(scale))
        return yd[:t], yd_enh[:t], sr

    def _demix_frontend(self):
        """Lazily-built demix-dialog separation front-end for the auto-route.

        Requires a SEPARATION-GRADE demixer: ported MVSEP ``.th`` ensembles
        or the chip-trained ``demix_mc.npz`` (+10.61 dB/stem, ``make
        weights``).  The committed ``demix_synthetic.npz`` fallback is
        explicitly EXCLUDED — measured 2026-08-20: its dialog stem is the
        mixture attenuated ~160x (corr 0.96 with the input, no separation),
        which near-silences the file and scores 100% DER.  Returns None
        when no qualifying demixer is available (the route keeps the
        denoise backend).  The stem is rescaled to the input RMS before
        returning: the diarizer only needs relative content, and stem
        levels vary across demixer checkpoints."""
        if not hasattr(self, "_demix_fe"):
            import os

            from ..utils.weights import WEIGHTS_ROOT
            from .enhance import make_enhance_fn

            env = os.environ.get("SDTPU_DEMUCS_CKPTS", "")
            has_ported = bool([p for p in env.split(":") if p]
                              or sorted(WEIGHTS_ROOT.glob("*.th")))
            mc = WEIGHTS_ROOT / "demix_mc.npz"
            if has_ported or mc.exists():
                raw_fe = make_enhance_fn(
                    "demix-dialog",
                    weights=None if has_ported else str(mc))

                def fe(yd):
                    out = raw_fe(yd)
                    r_in = jnp.sqrt(jnp.mean(jnp.square(yd)) + 1e-12)
                    r_out = jnp.sqrt(jnp.mean(jnp.square(out)) + 1e-12)
                    return out * (r_in / r_out)

                self._demix_fe = fe
            else:
                log.warning("enhance auto-route: no separation-grade "
                            "demixer available (ported .th or demix_mc.npz "
                            "via `make weights`) — keeping the denoise "
                            "backend for babble-like background")
                self._demix_fe = None
        return self._demix_fe

    _SNR_FRAME = 800  # 50 ms @ 16 kHz — syllable-scale energy frames

    def _estimate_snr_db(self, yd: jnp.ndarray, n_valid: int) -> float:
        """Cheap noise-floor probe for ``EnhanceConfig.scope == 'auto'``:
        10·log10(p95/p05) of 50 ms frame energies over the valid samples.
        Speech-with-gaps puts p05 on the inter-turn floor and p95 on speech
        peaks, so the ratio tracks SNR; digital-silence gaps give a huge
        ratio (clean ⇒ enhancement skipped).  The tail percentiles matter:
        p90/p10 mixes mid-speech frames into both ends and measured as low
        as 17.5 dB on CLEAN conversations, while p95/p05 separates clean
        (38.6–61 dB) from noisy (8.9–16.9 dB) across every synthesis domain
        (measured 2026-08-18).  One tiny dispatch + scalar pull per file;
        compiles once per pad bucket (fixed shapes).

        Known limits of the cheap statistic: a noise-gated recording
        (digitally zeroed gaps around noisy speech) measures a huge ratio
        and skips denoising — same behavior as the old always-off default,
        so nothing regresses; pause-free continuous speech can measure low
        and engage needlessly — harmless, since vad-scope denoising leaves
        embeddings on the raw signal (measured DER-neutral on clean files)."""
        if not hasattr(self, "_snr_jit"):
            frame = self._SNR_FRAME

            def stats(y, n):
                f = y[: (y.shape[0] // frame) * frame].astype(jnp.float32)
                fr = f.reshape(-1, frame)
                e = jnp.mean(jnp.square(fr), axis=1)
                idx = jnp.arange(e.shape[0])
                valid = (idx + 1) * frame <= n
                e = jnp.where(valid, e, jnp.nan)
                # noise-FLOOR spectral shape (the babble-vs-stationary router
                # statistic, EnhanceConfig.auto_route_demix): mean power
                # spectrum of the lowest-energy decile of valid frames, then
                # the fraction of that power above sr/8 (4 kHz @ 16 kHz).
                # Competing speech is speech-shaped (rolls off above ~1-2 kHz
                # -> small fraction); stationary broadband noise is flat
                # (~0.5).  An energy-modulation statistic was tried first and
                # REJECTED: measured below-median frame-energy spread was
                # babble5 4.4-4.8 dB < white10 6.1-6.6 dB — at low SNR the
                # quiet-speech frames dominate the spread in both domains
                # (scripts/exp_babble_probe.py, 2026-08-20).
                floor = e <= jnp.nanpercentile(e, 10.0)
                w = jnp.where(floor, 1.0, 0.0)
                ps = jnp.sum(
                    jnp.square(jnp.abs(jnp.fft.rfft(fr, axis=1)))
                    * w[:, None], axis=0)
                hf = jnp.sum(ps[frame // 4:]) / (jnp.sum(ps) + 1e-30)
                return (jnp.nanpercentile(e, 5.0),
                        jnp.nanpercentile(e, 95.0),
                        hf)

            self._snr_jit = jax.jit(stats)
        p10, p90, hf = self._snr_jit(yd, jnp.int32(n_valid))
        p10, p90, hf = float(p10), float(p90), float(hf)
        # 1.0 (flat / undecidable) = never route: the route fires on hf
        # BELOW the threshold (speech-shaped floor)
        self._last_floor_hf_frac = hf if np.isfinite(hf) and hf > 0.0 else 1.0
        if not np.isfinite(p90) or p90 <= 0.0:
            return float("inf")  # empty/near-silent file: nothing to denoise
        return 10.0 * float(np.log10(p90 / max(p10, 1e-12 * p90 + 1e-30)))

    # ------------------------------------------------------ streamed ingest --
    # Chunk-pipelined ingest (round 3): the single-file wall on the axon
    # tunnel was dominated by the serialized whole-file upload (~0.5 s for a
    # 10-min file) followed by VAD + grid compute that could not start until
    # the last byte landed.  Here the int16 waveform uploads in PAD_BUCKET
    # chunks (async), the whole-file scalars the device preprocess needed
    # (LUFS gain, DC mean, SNR probe) are computed on HOST underneath the
    # transfers, and then ONE fused dispatch per chunk runs preprocess + VAD
    # probs + frame energy + the embedding grid — chunk i's compute overlaps
    # chunk i+1's transfer.  Shapes are constant (one trace), margins come
    # from the neighbor chunks so the stitch is exact.

    def _host_snr_db(self, x: np.ndarray) -> float:
        """Host mirror of :meth:`_estimate_snr_db` (same 50 ms frames and
        p95/p05 statistic) for the streamed path."""
        frame = self._SNR_FRAME
        t = (x.shape[-1] // frame) * frame
        if t == 0:
            return float("inf")
        e = np.mean(np.square(x[:t].reshape(-1, frame)), axis=1)
        p5, p95 = np.percentile(e, [5.0, 95.0])
        if not np.isfinite(p95) or p95 <= 0.0:
            return float("inf")
        return 10.0 * float(np.log10(p95 / max(p5, 1e-12 * p95 + 1e-30)))

    def _streamed_fused_fn(self, sr: int, u: int, m_l: int, m_r: int,
                           ov: bool = False):
        """Jitted (prev, cur, next, scale, gain, dc) -> (probs, energy, grid
        [, overlap-hard]) over one core chunk with real neighbor context.

        ``ov`` appends the overlap DETECTOR to the fused program: 5 s
        windows every ``overlap.chunk_hop_s`` are sliced from the chunk's
        RAW (dequantized, pre-preemphasis — the detector trained on raw
        generator audio) waveform with the same shifted-reshape framing as
        the mel frontend, and the segmentation net's hard slot decisions
        ride the one packed pull.  The standalone rescue's whole-file
        re-upload + separate dispatches measured 687x -> 238x RTF on the
        600 s bench; fused, the detector costs one MXU forward per chunk
        and ZERO extra transfers."""
        key = ("fused", sr, u, m_l, m_r, ov)
        if getattr(self, "_fused_key", None) == key:
            return self._fused_fn
        cfg = self.cfg
        hop_v = int(round(cfg.vad.hop_ms / 1000.0 * sr))
        grid_win = int(round(cfg.reseg.win_s * sr))
        grid_hop = int(round(cfg.reseg.hop_s * sr))
        wpc = u // grid_hop
        f0, f1 = m_l // hop_v, m_l // hop_v + u // hop_v
        model, params = self._grid_model, self._grid_params
        vad_fn = self.vad_probs_fn
        acfg = cfg.audio
        want_energy = cfg.vad.energy_floor_db is not None
        ov_hard_fn = self._overlap_hard_fn() if ov else None
        ocfg = cfg.overlap
        win5 = int(round(ocfg.chunk_s * sr))
        stride5 = max(1, int(round(ocfg.chunk_hop_s * sr)))

        def fused(c_prev, c_cur, c_next, scale, n_valid):
            y3 = jnp.concatenate([c_prev[-m_l:], c_cur, c_next[:m_r]])
            y3 = y3.astype(jnp.float32) * (scale / 32767.0)
            y_raw = y3  # pre-gain/DC/preemphasis: the overlap detector's
            # training distribution is raw generator audio
            if acfg.target_lufs is not None:
                # per-chunk gated loudness over the chunk's CORE samples —
                # the whole-file meter would make every chunk's compute wait
                # for the last upload (and the host mirror measured 6-19 s
                # on this 1-core box: f64 lfilter/cumsum run at ~1 M/s).
                # The encoder is gain-invariant (log-mel sliding mean-norm),
                # the VAD is level-augmented, and single-chunk files (<= the
                # 60 s bucket) are exactly the whole-file meter.
                from ..dsp.loudness import integrated_loudness

                lufs = integrated_loudness(y3[m_l:m_l + u], sr)
                gain = 10.0 ** ((acfg.target_lufs - lufs) / 20.0)
                gain = jnp.where(lufs <= -199.0, 1.0, gain)
                y3 = jnp.clip(y3 * gain, -0.99, 0.99)
            if acfg.remove_dc:
                core = y3[m_l:m_l + u]
                y3 = y3 - jnp.sum(core) / jnp.maximum(n_valid, 1.0)
            if acfg.preemphasis is not None:
                from ..dsp.preprocess import preemphasis

                y3 = preemphasis(y3, acfg.preemphasis)
            y3 = jnp.clip(y3, -0.99, 0.99)
            # emit u//hop + 1 frames per chunk: frame f1 (= frame 0 of the
            # NEXT chunk's core) is kept only for the final chunk, so the
            # streamed frame count matches the legacy t//hop + 1 convention
            # even when t is an exact multiple of the chunk bucket (the last
            # 10 ms frame of the 600 s bench files used to be dropped)
            probs = vad_fn(y3[None])[0, f0:f1 + 1]
            energy = None
            if want_energy:
                energy = frame_energy_db_chunk(
                    y3[None], hop=hop_v, n_extra=1)[0, f0:f1 + 1]
            grid = model.encode_grid_chunk(params, y3, wpc, m_l,
                                           grid_win, grid_hop)
            out = (probs, energy, grid) if want_energy else (probs, grid)
            if ov_hard_fn is not None:
                from ..dsp.framing import frame_signal

                wpsc = u // stride5
                seg_in = y_raw[m_l:m_l + (wpsc - 1) * stride5 + win5]
                wins = frame_signal(seg_in[None], win5, stride5,
                                    pad_tail=False)[0]     # [wpsc, win5]
                out = out + (ov_hard_fn(wins).astype(jnp.float32),)
            return out

        self._fused_key = key
        self._fused_fn = jax.jit(fused)
        return self._fused_fn

    def streaming_capable(self) -> bool:
        """True when host-array/path sources will take the streamed
        chunk-pipelined ingest (callers like the corpus worker then skip
        their own whole-file prefetch — the streamed path's chunked async
        uploads ARE the prefetch, and a second 2x-size whole-file upload
        only adds tunnel traffic)."""
        cfg = self.cfg
        model = self._grid_model
        return (cfg.embed.mode == "grid"
                and model is not None
                and hasattr(model, "encode_grid_chunk")
                and getattr(model, "streaming_trained", False)
                and cfg.embed.grid_backend in ("auto", "streaming"))

    def _streamed_stages(self, y: np.ndarray, sr: int):
        """Returns (probs, energy_db, win_embs, starts_s, total_s) or None
        when this source/config cannot take the streamed path."""
        st = self._streamed_start(y, sr)
        return None if st is None else self._streamed_collect(st)

    def _streamed_start(self, y: np.ndarray, sr: int):
        """Dispatch phase of the streamed ingest: chunk uploads, fused
        per-chunk programs, and the device-side pack — all ASYNC.  Returns
        an opaque state for :meth:`_streamed_collect`, or None when this
        source/config cannot take the streamed path.  Split out (round 4,
        VERDICT r3 #3) so the corpus worker can dispatch file i+1's chunks
        while file i's tail compute and host algebra are still in flight —
        the file-boundary bubble (final pull + clustering + next file's
        first upload, all serialized on the tunnel) was the remaining gap
        between single-file and corpus RTF."""
        cfg = self.cfg
        if not self.streaming_capable():
            return None
        mel_hop = sr * 10 // 1000
        grid_win = int(round(cfg.reseg.win_s * sr))
        grid_hop = int(round(cfg.reseg.hop_s * sr))
        hop_v = int(round(cfg.vad.hop_ms / 1000.0 * sr))
        u = int(self._PAD_BUCKET_S * sr)
        if (grid_win % mel_hop or grid_hop % mel_hop or u % grid_hop
                or u % hop_v):
            return None
        m_l = 4 * sr  # >= trunk receptive field + sliding-stat window
        m_l = -(-m_l // grid_hop) * grid_hop
        m_r = m_l + grid_win - grid_hop
        if m_l % hop_v or u < m_r:
            return None

        t = int(y.shape[-1])
        n_chunks = max(1, -(-t // u))
        q, scale = self._quantize_host(np.asarray(y, np.float32), n_chunks * u)
        # async uploads first; host stats run underneath the transfers
        zero = getattr(self, "_zero_chunk", None)
        if zero is None or zero.shape[0] != u:
            zero = self._zero_chunk = jax.device_put(np.zeros(u, np.int16))
        chunks = [jax.device_put(q[i * u:(i + 1) * u]) for i in range(n_chunks)]

        if self.enhance_fn is not None and self.cfg.enhance.scope != "auto":
            return None  # enhancement forced on: take the legacy path
        # cheap f32 host probe (0.03 s for 10 min; the f64 DSP mirrors
        # measured 6-19 s on this host) — gates enhance-auto AND the
        # noise-sensitive refine splitting (ClusterConfig.refine_min_snr_db)
        x = q[:t].astype(np.float32) * (scale / 32767.0)
        self._last_snr_db = self._host_snr_db(x)
        if (self.enhance_fn is not None
                and self._last_snr_db < cfg.enhance.auto_snr_db):
            return None  # enhancement engaged: take the legacy path

        # fused overlap detector: only when enabled, the noise veto passes
        # (same gate as the rescue site — the conversation-trained detector
        # hallucinates on babble beds), the window grid divides the chunk,
        # and a checkpoint ships
        ocfg = cfg.overlap
        win5 = int(round(ocfg.chunk_s * sr))
        stride5 = max(1, int(round(ocfg.chunk_hop_s * sr)))
        snr = self._last_snr_db
        ov = bool(
            ocfg.enabled
            and (ocfg.min_snr_db is None or snr is None
                 or snr >= ocfg.min_snr_db)
            and u % stride5 == 0 and win5 - stride5 <= m_r
            and self._overlap_hard_fn() is not None)

        fused = self._streamed_fused_fn(sr, u, m_l, m_r, ov)
        s = jnp.float32(scale)
        want_energy = cfg.vad.energy_floor_db is not None
        outs = []
        for i in range(n_chunks):
            prev = chunks[i - 1] if i > 0 else zero
            nxt = chunks[i + 1] if i + 1 < n_chunks else zero
            n_valid = jnp.float32(min(u, t - i * u))
            outs.append(fused(prev, chunks[i], nxt, s, n_valid))

        from ..dsp.framing import num_frames as _nf

        # ONE device-side concat + ONE flat pull: pulling the 3 x n_chunks
        # small outputs separately paid a ~25 ms tunnel round trip EACH
        # (measured 0.9 s for 3.5 MB at 600 s — the new long pole once the
        # uploads overlapped compute)
        per = (3 if want_energy else 2) + (1 if ov else 0)
        pack_key = (n_chunks, want_energy, ov)
        packers = getattr(self, "_pack_fns", None)
        if packers is None:
            packers = self._pack_fns = {}
        g_idx = 2 if want_energy else 1  # grid position within a row
        if pack_key not in packers:

            def pack(*flat):
                rows = [flat[i * per:(i + 1) * per] for i in range(n_chunks)]
                # each chunk carries fpc+1 VAD frames; frame fpc of chunk c
                # duplicates frame 0 of chunk c+1, so interior chunks drop it
                # and only the final chunk keeps its trailing frame — total
                # n_chunks*fpc + 1 (the legacy framing convention)
                parts = [jnp.concatenate(
                    [r[0][:-1] for r in rows[:-1]] + [rows[-1][0]])]
                if want_energy:
                    parts.append(jnp.concatenate(
                        [r[1][:-1] for r in rows[:-1]] + [rows[-1][1]]))
                grid = jnp.concatenate([r[g_idx] for r in rows])
                parts.append(grid.reshape(-1).astype(jnp.float32))
                if ov:
                    parts.append(jnp.concatenate(
                        [r[-1].reshape(-1) for r in rows]))
                return jnp.concatenate(parts)

            packers[pack_key] = jax.jit(pack)
        flat_args = [a for o in outs for a in o]
        emb_dim = outs[0][g_idx].shape[-1]
        flat_dev = packers[pack_key](*flat_args)  # async dispatch, no pull

        st = {
            "flat_dev": flat_dev,
            "n_frames": t // hop_v + 1,
            "w_total": _nf(t, grid_win, grid_hop, pad_tail=True),
            "n_probs": n_chunks * (u // hop_v) + 1,
            "want_energy": want_energy,
            "emb_dim": emb_dim,
            "grid_len": n_chunks * (u // grid_hop) * emb_dim,
            "starts_s": window_starts(
                t, sr, cfg.reseg.win_s, cfg.reseg.hop_s) / sr,
            "t": t, "sr": sr,
            "snr_db": self._last_snr_db,
            "floor_hf": getattr(self, "_last_floor_hf_frac", 1.0),
            "ov": ov,
        }
        if ov:
            seg_f, seg_k = outs[0][-1].shape[1], outs[0][-1].shape[2]
            st["ov_shape"] = (n_chunks * (u // stride5), seg_f, seg_k)
            # windows the standalone detector would have scored: the rest
            # cover tail padding
            st["ov_n"] = max(1, -(-max(t - win5, 0) // stride5) + 1)
        return st

    def _streamed_collect(self, st: dict):
        """Pull phase of the streamed ingest: ONE flat device->host read +
        host-side slicing.  Restores the per-file probe state captured at
        dispatch time (two files may be in flight on one pipeline object
        under the corpus worker's cross-file pipelining)."""
        flat = np.asarray(st["flat_dev"])
        self._last_snr_db = st["snr_db"]
        self._last_floor_hf_frac = st["floor_hf"]
        n_frames, n_probs = st["n_frames"], st["n_probs"]
        probs = flat[:n_probs][:n_frames]
        off = n_probs
        energy = None
        if st["want_energy"]:
            energy = flat[off:off + n_probs][:n_frames]
            off += n_probs
        grid = (flat[off:off + st["grid_len"]]
                .reshape(-1, st["emb_dim"])[:st["w_total"]])
        if st.get("ov"):
            off += st["grid_len"]
            st["ov_acts"] = (flat[off:].reshape(st["ov_shape"])
                             [:st["ov_n"]])
        return probs, energy, grid, st["starts_s"], st["t"] / st["sr"]

    # ----------------------------------------------------------------- vad --
    def vad_probs(self, y: jnp.ndarray, sr: int, defer: bool = False):
        hop = int(round(self.cfg.vad.hop_ms / 1000.0 * sr))
        return chunked_framewise(self.vad_probs_fn, y, sr, frame_hop=hop,
                                 defer=defer)

    def vad_frame_energy(self, y: jnp.ndarray, sr: int, defer: bool = False):
        """Per-frame signal energy on the VAD grid (for the energy-floor
        veto, :func:`~..segment.vad_post.apply_energy_veto`) — same bucketed
        chunk dispatch as the probs."""
        hop = int(round(self.cfg.vad.hop_ms / 1000.0 * sr))
        if not hasattr(self, "_energy_fn"):
            self._energy_fn = jax.jit(
                partial(frame_energy_db_chunk, hop=hop, n_extra=1))
        return chunked_framewise(self._energy_fn, y, sr, frame_hop=hop,
                                 defer=defer)

    # ---------------------------------------------------------------- main --
    def _stream_host_array(self, source):
        """Source -> host waveform array if the streamed path can take it."""
        sr = self.cfg.audio.sample_rate
        if isinstance(source, np.ndarray):
            return source, source
        if (isinstance(source, tuple) and len(source) == 2
                and isinstance(source[0], np.ndarray) and source[1] == sr):
            return source[0], source
        if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
            y_dec, dec_sr = read_audio(source, target_sr=sr, mono=True)
            return y_dec, (y_dec, dec_sr)
        return None, source

    def stream_start(self, source):
        """Dispatch a file's streamed ingest without blocking: uploads +
        fused chunk programs + the device-side pack.  Returns an opaque
        state for :meth:`stream_finish`, or None when this source/config
        must take the non-streamed path (then call the pipeline normally).
        Public so the corpus worker can overlap file i+1's chunk uploads
        and device compute with file i's pull + host clustering (VERDICT
        r3 #3: the file-boundary bubble)."""
        self._last_snr_db = None
        y_host, norm_source = self._stream_host_array(source)
        if y_host is None:
            return None
        st = self._streamed_start(np.asarray(y_host, np.float32),
                                  self.cfg.audio.sample_rate)
        if st is None:
            return {"legacy_source": norm_source}
        st["legacy_source"] = None
        st["y_host"] = y_host  # kept for the overlap-rescue stage
        return st

    def stream_finish(self, st: dict) -> DiarizationResult:
        """Complete a :meth:`stream_start` dispatch: one flat pull + VAD
        post + clustering/segments."""
        if st.get("legacy_source") is not None:
            return self._legacy_call(st["legacy_source"])
        cfg = self.cfg
        probs, energy_db, win_embs, starts_s, total_s = \
            self._streamed_collect(st)
        with stage_timer(log, "vad-post"):
            speech = vad_segments_from_probs(
                probs, cfg.vad, frame_energy_db=energy_db)
        if len(speech) == 0:
            empty = SegmentArray.from_pairs([])
            return DiarizationResult(empty, empty, 0)
        overlap_regions = None
        if st.get("ov_acts") is not None:
            from ..segment.overlap import regions_from_hard_acts

            overlap_regions = regions_from_hard_acts(
                st["ov_acts"], total_s,
                chunk_hop_s=cfg.overlap.chunk_hop_s,
                min_on_s=cfg.overlap.min_on_s,
                min_gap_s=cfg.overlap.min_gap_s)
        return self._segments_from_grid(
            speech, probs, win_embs, starts_s, total_s, {},
            y=st.get("y_host"), sr=st["sr"],
            overlap_regions=overlap_regions)

    def __call__(self, source, collect_diagnostics: bool = False) -> DiarizationResult:
        sr = self.cfg.audio.sample_rate
        self._last_snr_db = None  # per-file; a stale estimate must not gate

        # streamed chunk-pipelined ingest (see the section comment above):
        # host-array / path sources with the streaming grid engaged skip the
        # whole-file upload barrier entirely
        y_host, source = self._stream_host_array(source)
        if y_host is not None and not collect_diagnostics:
            with stage_timer(log, "streamed-ingest"):
                st = self._streamed_start(np.asarray(y_host, np.float32), sr)
            if st is not None:
                st["legacy_source"] = None
                st["y_host"] = y_host
                return self.stream_finish(st)
        return self._legacy_call(source, collect_diagnostics)

    def _legacy_call(self, source, collect_diagnostics: bool = False) -> DiarizationResult:
        cfg = self.cfg
        sr = cfg.audio.sample_rate

        with stage_timer(log, "load+preprocess"):
            y, y_vad, sr = self._load_waves(source)
        total_s = y.shape[-1] / sr

        # one dense embedding grid serves SCD + segment embeddings + reassign
        grid_win_s = cfg.reseg.win_s
        grid_hop_s = cfg.reseg.hop_s
        backend = cfg.embed.grid_backend
        # 'auto' uses the streaming grid only for encoders TRAINED under
        # streaming statistics: per-window-trained weights lose real DER
        # through the sliding-stat trunk (0.9% -> 6.0% measured on the
        # synthetic selftest), so they stay on the windowed grid.
        streaming = backend == "streaming" or (
            backend == "auto"
            and getattr(self._grid_model, "streaming_trained", False)
            and hasattr(self._grid_model, "encode_grid_chunk"))
        if streaming and (self._grid_model is None
                          or not hasattr(self._grid_model, "encode_grid_chunk")):
            log.warning("grid_backend=streaming needs an (model, params) "
                        "encoder with encode_grid_chunk; falling back to "
                        "windowed")
            streaming = False
        if streaming:
            # the streaming trunk pools whole mel frames, so the grid must
            # align to the 10 ms mel hop — otherwise encode_grid_chunk would
            # assert inside jit tracing (ADVICE r1).  Fall back gracefully.
            mel_hop = sr * 10 // 1000
            win = int(round(grid_win_s * sr))
            hop = int(round(grid_hop_s * sr))
            if win % mel_hop or hop % mel_hop:
                log.warning(
                    "grid geometry win=%.3fs hop=%.3fs is not a multiple of "
                    "the 10 ms mel hop; streaming grid disabled, using the "
                    "windowed backend", grid_win_s, grid_hop_s)
                streaming = False
        # Dispatch VAD and the embedding grid together BEFORE pulling either:
        # the grid covers the whole file (it does not depend on VAD output),
        # so its compute overlaps the VAD pull + host segment algebra instead
        # of starting after them — on the axon tunnel (degraded-transfer
        # state, see STATUS.md) that hides several hundred ms per file.
        with stage_timer(log, "dispatch"):
            vad_finish = self.vad_probs(y_vad, sr, defer=True)
            energy_finish = (
                self.vad_frame_energy(y_vad, sr, defer=True)
                if cfg.vad.energy_floor_db is not None else None)
            if streaming:
                embed_finish = embed_windows_streaming(
                    self._grid_model, self._grid_params, y, sr,
                    grid_win_s, grid_hop_s, defer=True,
                )
            else:
                embed_finish = embed_windows(
                    self.encode_fn, y, sr, grid_win_s, grid_hop_s,
                    batch=cfg.embed.batch_size,
                    max_batch=cfg.embed.max_batch_size, defer=True,
                )

        with stage_timer(log, "vad"):
            probs = vad_finish()
            energy_db = energy_finish() if energy_finish is not None else None
            speech = vad_segments_from_probs(
                probs, cfg.vad, frame_energy_db=energy_db)
        if len(speech) == 0:
            empty = SegmentArray.from_pairs([])
            return DiarizationResult(empty, empty, 0)

        with stage_timer(log, "embed-grid"):
            win_embs = embed_finish()
            starts_s = window_starts(y.shape[-1], sr, grid_win_s, grid_hop_s) / sr

        return self._segments_from_grid(
            speech, probs, win_embs, starts_s, total_s,
            dict(collect=collect_diagnostics), y=y, sr=sr)

    def _segments_from_grid(self, speech, probs, win_embs, starts_s, total_s,
                            diag, y=None, sr=None,
                            overlap_regions=None) -> DiarizationResult:
        """Shared SCD → embed → cluster → refine → merge → (reseg) tail,
        fed by either the streamed or the legacy grid path."""
        cfg = self.cfg
        grid_win_s = cfg.reseg.win_s
        grid_hop_s = cfg.reseg.hop_s
        collect_diagnostics = bool(diag.get("collect"))

        # SCD at its own hop = a stride over the shared grid
        speech2 = speech
        if cfg.scd.enabled:
            stride = max(1, int(round(cfg.scd.hop_ms / 1000.0 / grid_hop_s)))
            with stage_timer(log, "scd"):
                speech2 = scd_split(
                    speech,
                    win_embs[::stride],
                    starts_s[::stride],
                    grid_win_s,
                    grid_hop_s * stride,
                    z_threshold=cfg.scd.peak_z_threshold,
                    min_speech_s=cfg.scd.min_speech_ms / 1000.0,
                )
        log.info("segments: vad=%d scd=%d", len(speech), len(speech2))

        with stage_timer(log, "segment-embeddings"):
            if cfg.embed.mode == "bucketed":
                seg_embs = embed_segments_bucketed(
                    self.encode_fn, np.asarray(y), sr, speech2,
                    min_duration_ms=cfg.embed.min_duration_ms,
                    pad_duration_ms=cfg.embed.pad_duration_ms,
                    batch=min(cfg.embed.batch_size, 32),
                )
            else:
                seg_embs = segment_embeddings_from_grid(
                    win_embs, starts_s, grid_win_s, speech2
                )
            if cfg.embed.whiten and len(speech2) > 4:
                seg_embs = np.asarray(cluster_mod.whiten(jnp.asarray(seg_embs)))

        with stage_timer(log, "cluster"):
            labels = self._cluster(seg_embs)
            # window-driven bisection thresholds were calibrated on the
            # flagship spectral + streaming setup; other methods keep their
            # own behavior (ADVICE r1)
            refine_thr = cfg.cluster.refine_sub_cos
            if refine_thr is None:
                refine_thr = getattr(self._grid_model, "refine_sub_cos", None)
            if refine_thr is None:
                from ..cluster.spectral import _SPLIT_MAX_CENT_COS

                refine_thr = _SPLIT_MAX_CENT_COS
            snr = getattr(self, "_last_snr_db", None)
            snr_floor = cfg.cluster.refine_min_snr_db
            snr_ok = (snr is None or snr_floor is None or snr >= snr_floor)
            if not snr_ok:
                log.info("refine: skipped (est SNR %.1f dB < %.1f floor — "
                         "window statistics untrustworthy under noise)",
                         snr, snr_floor)
            if (cfg.cluster.refine_splits and refine_thr > 0
                    and len(speech2) > 1 and snr_ok
                    and cfg.cluster.method == "spectral"):
                labels = cluster_mod.refine_labels_by_windows(
                    labels, speech2, win_embs, starts_s, grid_win_s,
                    cfg.cluster.max_speakers, sub_cos_thr=refine_thr,
                    seg_embs=seg_embs,
                )
        speech2 = SegmentArray(speech2.starts, speech2.ends, labels)
        n_spk = int(labels.max()) + 1 if labels.size else 0
        log.info("clustered %d segments into %d speakers", len(speech2), n_spk)

        with stage_timer(log, "merge"):
            speech3, embs3 = conservative_merge(
                speech2,
                seg_embs,
                max_gap_s=cfg.merge.max_gap_s,
                max_turn_s=cfg.merge.max_turn_s,
                min_cos=cfg.merge.min_cos,
            )

        if cfg.reseg.enabled:
            with stage_timer(log, "reassign"):
                speech4 = frame_reassign(
                    speech, speech3, embs3, win_embs, starts_s,
                    grid_win_s, total_s,
                    hmm=cfg.reseg.hmm,
                    hmm_self_loop=cfg.reseg.hmm_self_loop,
                    adjacent_gap_s=cfg.reseg.adjacent_gap_s,
                )
        else:
            speech4 = speech3

        final = merge_adjacent(speech4, cfg.merge.max_gap_s)
        if cfg.overlap.enabled and overlap_regions is not None:
            # streamed path: detector activities came out of the fused
            # per-chunk program (gate already applied at dispatch)
            with stage_timer(log, "overlap-rescue"):
                final = self._overlap_rescue(
                    y, sr or cfg.audio.sample_rate, final,
                    win_embs, starts_s, grid_win_s,
                    regions=overlap_regions)
        elif cfg.overlap.enabled and y is not None:
            snr = getattr(self, "_last_snr_db", None)
            floor = cfg.overlap.min_snr_db
            if snr is not None and floor is not None and snr < floor:
                # noise veto (OverlapConfig.min_snr_db): the conversation-
                # trained detector reads a babble bed as overlap (measured
                # babble15 3.48 -> 10.81% with rescue ON)
                log.info("overlap-rescue: skipped (est SNR %.1f dB < %.1f "
                         "floor — detector untrustworthy under noise)",
                         snr, floor)
            else:
                with stage_timer(log, "overlap-rescue"):
                    final = self._overlap_rescue(
                        y, sr or cfg.audio.sample_rate, final,
                        win_embs, starts_s, grid_win_s)
        num_speakers = len({int(k) for k in final.spks if k >= 0})

        diagnostics: dict[str, Any] = {}
        if collect_diagnostics:
            diagnostics = {
                "vad_probs": probs,
                "window_embeddings": win_embs,
                "window_starts_s": starts_s,
                "segment_embeddings": seg_embs,
                "labels": labels,
                # per-stage segment snapshots (for stage-level DER attribution)
                "stage_clustered": speech2,
                "stage_merged": speech3,
                "stage_reassigned": speech4,
            }
        return DiarizationResult(final, speech, num_speakers, diagnostics)

    # ------------------------------------------------------------ overlap --
    def _overlap_seg(self):
        """Lazy (model, params) for the overlap detector, or None.  Shared
        by the fused streamed path (the model runs INSIDE the per-chunk
        device program) and the legacy standalone detect."""
        if not hasattr(self, "_overlap_seg_mp"):
            from ..utils.weights import prefer_weights

            w = self.cfg.overlap.weights or prefer_weights(
                ("segmentation_conv.npz", "segmentation_xf.npz",
                 "segmentation_ow3.npz", "segmentation_powerset.npz",
                 "segmentation_synthetic.npz"))
            if w is None:
                log.warning("overlap rescue: no segmentation checkpoint "
                            "ships — stage disabled")
                self._overlap_seg_mp = None
            else:
                from ..train.recipes import load_segmentation

                self._overlap_seg_mp = load_segmentation(w)
        return self._overlap_seg_mp

    def _overlap_hard_fn(self):
        """Pure ``[n, T] -> [n, F, K]`` HARD slot decisions, traceable
        inside the fused streamed program (no jit wrapper of its own)."""
        mp = self._overlap_seg()
        if mp is None:
            return None
        model, params = mp
        if getattr(model.net, "powerset", False):
            memb = jnp.asarray(model.net.membership())

            def hard(chunks):
                lg = model.head_logits(params, chunks)
                return memb[jnp.argmax(lg, axis=-1)]

            return hard
        return lambda chunks: (model.activities(params, chunks) >= 0.5
                               ).astype(jnp.float32)

    def _overlap_rescue(self, y, sr, final, win_embs, starts_s, win_s,
                        regions=None):
        """Second-speaker segments from the segmentation model's overlap
        detections (segment/overlap.py) on top of the flagship map.
        ``regions`` short-circuits the standalone detect when the streamed
        ingest already computed the detector activities in its fused
        per-chunk program (the standalone whole-file re-upload measured
        687x -> 238x RTF on the 600 s bench)."""
        from ..segment.overlap import add_overlap_segments

        ocfg = self.cfg.overlap
        if regions is not None:
            return add_overlap_segments(
                final, regions, win_embs, np.asarray(starts_s), win_s,
                min_cos=ocfg.min_cos,
                max_overlap_frac=ocfg.max_overlap_frac)
        if not hasattr(self, "_overlap_fn"):
            from .segmentation import make_seg_activities_fn

            mp = self._overlap_seg()
            self._overlap_fn = (None if mp is None
                                else make_seg_activities_fn(*mp))
        if self._overlap_fn is None:
            return final
        from ..segment.overlap import detect_overlap_regions

        regions = detect_overlap_regions(
            np.asarray(y, np.float32), sr, self._overlap_fn,
            chunk_s=ocfg.chunk_s, chunk_hop_s=ocfg.chunk_hop_s,
            min_on_s=ocfg.min_on_s, min_gap_s=ocfg.min_gap_s)
        return add_overlap_segments(
            final, regions, win_embs, starts_s, win_s,
            min_cos=ocfg.min_cos, max_overlap_frac=ocfg.max_overlap_frac)

    # ------------------------------------------------------------- cluster --
    def _cluster(self, embs: np.ndarray) -> np.ndarray:
        c = self.cfg.cluster
        n = embs.shape[0]
        if n == 0:
            return np.zeros((0,), dtype=np.int32)
        if n == 1:
            return np.zeros((1,), dtype=np.int32)
        if c.method == "spectral":
            labels = cluster_mod.spectral_cluster(
                embs, min_speakers=c.min_speakers, max_speakers=c.max_speakers,
                p_percentile=c.p_percentile,
            )
        elif c.method == "ahc":
            labels = cluster_mod.ahc_cluster(
                embs, cos_threshold=c.cos_threshold,
                min_speakers=c.min_speakers, max_speakers=c.max_speakers,
            )
        elif c.method == "hdbscan":
            labels = cluster_mod.hdbscan_cleaned(
                embs, min_cluster_size=c.min_cluster_size,
                centroid_cos_threshold=c.cos_threshold,
            )
        elif c.method == "hdbscan2":
            labels = cluster_mod.hdbscan_two_stage(
                embs, min_cluster_size=c.min_cluster_size,
                centroid_cos_threshold=c.cos_threshold,
            )
        else:
            raise ValueError(f"unknown cluster method {c.method}")
        if (labels < 0).all():
            # all-noise fallback: one speaker (diar_diag.py:375-377)
            labels = np.zeros_like(labels)
        return labels.astype(np.int32)


def diarize(source, cfg: DiarizationConfig | None = None, **kwargs) -> list[Segment]:
    """One-call functional API mirroring ``anti_stick_diarize.diarize``:
    returns labeled segments for a path or (array, sr) input."""
    return DiarizationPipeline(cfg, **kwargs)(source).to_segments()
