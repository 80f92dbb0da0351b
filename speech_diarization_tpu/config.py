"""Unified, unit-consistent configuration schema.

The reference duplicates hyperparameters across three CLI styles with
inconsistent names/units and a positional-argument bug that silently shifts
every value by one slot (``anti_stick_diarize.py:563-599``; see SURVEY.md §2.5
item 3).  Here there is exactly ONE schema: every duration field carries an
explicit unit suffix (``_s`` seconds / ``_ms`` milliseconds), every entry point
hydrates the same frozen dataclasses by keyword, and defaults exist in one
place only.

Maps to the reference's ``DiarizationParameters``
(``diarization_baseline.py:27-39``) plus the 17 tunables of
``anti_stick_diarize.diarize()`` (``anti_stick_diarize.py:493-511``) and the
knobs of ``diar_diag.main()`` (``diar_diag.py:297-321``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping


@dataclass(frozen=True)
class AudioConfig:
    """Audio I/O + preprocessing (reference: ``anti_stick_diarize.py:29-61``)."""

    sample_rate: int = 16000
    target_lufs: float | None = -18.0  # loudness normalization target; None = off
    preemphasis: float | None = 0.97   # pre-emphasis coefficient; None = off
    remove_dc: bool = True


@dataclass(frozen=True)
class VadConfig:
    """VAD scoring + post-processing (reference: ``vad.py:167-186``)."""

    win_ms: float = 30.0
    hop_ms: float = 10.0
    on_threshold: float = 0.6
    off_threshold: float = 0.4
    morph_open_ms: float = 80.0
    morph_close_ms: float = 40.0
    min_speech_ms: float = 250.0
    min_silence_ms: float = 100.0
    speech_pad_ms: float = 40.0
    batch_frames: int = 8192  # frames per jitted VAD call (dense grid chunk)
    # Energy-floor veto: frames this many dB (power) below the file's speech
    # level (95th-percentile frame energy over net-confident frames) cannot
    # be speech, whatever the net says.  The conv-TCN's receptive field
    # leaks probability ~0.3-0.5 into short digital-silence gaps adjacent to
    # OUT-OF-FAMILY speech (measured: mid-gap frames at -80 dBFS score
    # p=0.27 mean / 18% above off-threshold on held-out LPC voices, while
    # in-domain FA is 0.00) — an energy veto is signal-level ground truth
    # the net cannot override.  None disables.
    energy_floor_db: float | None = -45.0
    # only veto runs at least this long, so intra-word stop closures
    # (30-100 ms of near-silence inside genuine speech) are never chipped
    energy_veto_min_ms: float = 150.0


@dataclass(frozen=True)
class ScdConfig:
    """Speaker-change detection (reference: ``anti_stick_diarize.py:78-127``)."""

    enabled: bool = True
    win_ms: float = 1000.0
    hop_ms: float = 200.0
    # z=1.0 (was 1.5): over-segmentation is benign (same-speaker merging
    # stitches the atoms back), while missed changes are fatal (an impure
    # segment can never be fixed downstream).  Measured on the 60 s 3-spk
    # tail seeds: z=1.0 dissolves a drifting-single over-split (seed 2005
    # 15.8% -> 0.5% DER), leaves 15 other seeds and the 600 s file within
    # noise (STATUS.md "60 s tail", /tmp scd sweeps 2026-08-18)
    peak_z_threshold: float = 1.0
    min_speech_ms: float = 1000.0


@dataclass(frozen=True)
class EmbedConfig:
    """Speaker-embedding extraction (reference: ``anti_stick_diarize.py:130-172``)."""

    backend: str = "ecapa"            # ecapa | eres2netv2 | campp
    dim: int = 192
    # 'grid'   : embed a dense [n_windows, win] grid once and derive segment
    #            embeddings as masked means (TPU-first; no per-segment launches).
    # 'bucketed': per-segment snippets padded to bucketed lengths (reference-style,
    #            mirrors pad-to-batch-max at anti_stick_diarize.py:150-169).
    mode: str = "grid"
    # dense-grid execution strategy:
    # 'windowed' : per-window encoder forwards (reference-faithful; required
    #              for ported checkpoints whose stats are per-utterance).
    # 'streaming': ONE shared trunk pass with sliding SE/mean-norm statistics
    #              + per-window attentive pooling — removes the ~10x trunk
    #              redundancy of the 1 s / 100 ms grid (win/hop overlap).
    # 'auto'     : streaming when the encoder exposes a trunk (shipped ECAPA
    #              weights), windowed otherwise.
    grid_backend: str = "auto"
    # NOTE: the flagship pipeline's dense grid geometry comes from
    # ResegConfig.win_s/hop_s (one grid serves SCD + embeddings + reassign);
    # these fields parameterize only the standalone segment-embedding helpers.
    grid_win_s: float = 1.5
    grid_hop_s: float = 0.75
    min_duration_ms: float = 500.0    # short segments get context padding
    pad_duration_ms: float = 150.0
    batch_size: int = 512
    # auto-bucketing ceiling for the dense-grid embedder: long files may be
    # batched up to this many windows per dispatch (each compiled shape is
    # paid for once; 1024 is the largest worth compiling on axon — measured).
    # Set equal to batch_size to pin the dispatch shape.
    max_batch_size: int = 1024
    whiten: bool = False              # embedding whitening (diar_diag.py:187-194)
    dtype: str = "bfloat16"           # model compute dtype (f32 accumulation)


@dataclass(frozen=True)
class ClusterConfig:
    """Clustering (reference: ``anti_stick_diarize.py:175-270``, ``diar_diag.py:213-229``)."""

    method: str = "spectral"          # spectral | ahc | hdbscan | hdbscan2
    min_speakers: int = 1
    max_speakers: int = 8
    # AHC / agglomerative threshold on cosine similarity (diar_diag cos_thr=0.68,
    # baseline clustering_threshold=0.70).
    cos_threshold: float = 0.70
    min_cluster_size: int = 2         # HDBSCAN-style density floor
    # spectral refinement
    p_percentile: float = 0.90
    asnorm: bool = False              # AS-Norm scoring (diar_diag.py:197-208)
    asnorm_topk: int = 200
    # window-driven recursive cluster bisection after clustering: rescues
    # moderately-similar speaker pairs the affinity threshold leaves merged
    # (cluster/spectral.refine_labels_by_windows); flagship pipeline only
    refine_splits: bool = True
    # bisection split threshold: None = take the encoder's calibrated value
    # (npz meta ``refine_sub_cos``, scripts/calibrate_bisect.py) falling back
    # to the built-in default; a float here overrides both; an encoder that
    # declares <= 0 (no measured single/merged separation on its cosine
    # scale) disables the refine stage unless this override says otherwise.
    refine_sub_cos: float | None = None
    # refine-splitting trusts window-level statistics that were calibrated
    # on clean audio; under heavy noise the bisection sub-cos band of true
    # SINGLES drops into the pair band (babble@15 dB: a single bisected at
    # 0.466 with purity 1.0 — unvetoable locally) and splits become
    # over-splits.  When the pipeline has an SNR estimate for the file
    # (the enhance-auto probe), refine only runs above this floor; files
    # without an estimate keep refine on.  None disables the gate.
    refine_min_snr_db: float | None = 25.0


@dataclass(frozen=True)
class ResegConfig:
    """Frame-level reassignment + HMM smoothing
    (reference: ``anti_stick_diarize.py:390-460``, ``diar_diag.py:231-247``).

    ``win_s``/``hop_s`` double as the DENSE GRID geometry (one grid serves
    SCD + segment embeddings + reassignment).  Round-3 measurements
    (2026-08-19, see STATUS.md): 2 s windows raise per-window embedding SNR
    enough that (a) the bisection refine separates near-collided speaker
    pairs cleanly and (b) window-level reassignment no longer adds value —
    on the 6-file probe set every reassign variant (argmax / sticky-HMM /
    margin-prior / score-smoothing) strictly *increased* confusion over the
    refined cluster labels (e.g. 600 s seed-0: 0.62% off vs 1.57% best-on),
    because with this encoder individual windows are noisier than pooled
    segment embeddings even at 2 s (oracle-centroid window accuracy
    0.87-0.97).  Resegmentation therefore defaults OFF; it remains a
    first-class switch for encoders whose window evidence is sharper."""

    enabled: bool = False
    win_s: float = 2.0
    hop_s: float = 0.1
    hmm: bool = False                 # sticky-HMM Viterbi over scores
    hmm_self_loop: float = 0.995      # alpha at diar_diag.py:231
    adjacent_gap_s: float = 0.05      # final adjacency merge (anti_stick:459)


@dataclass(frozen=True)
class MergeConfig:
    """Segment merge / boundary ops (reference: ``anti_stick_diarize.py:273-330``,
    ``diarization_baseline.py:188-233``)."""

    max_gap_s: float = 0.5
    max_turn_s: float = 30.0
    min_cos: float = 0.80
    boundary_pad_s: float = 0.04      # pad into silence (baseline fade_ms*2/1000)
    min_speech_s: float = 0.0         # drop segments shorter than this


@dataclass(frozen=True)
class StemsConfig:
    """Per-speaker stem extraction (reference: ``diarization_baseline.py:42-160``)."""

    max_segment_s: float = 20.0
    max_gap_s: float = 1.5
    fade_ms: float = 20.0
    min_stem_s: float = 3.0


@dataclass(frozen=True)
class EnhanceConfig:
    """Speech-enhancement front-end (reference: ``gtcrn_wrap.py``, ``zipenhancex.py``).

    Enabled by default with ``scope='auto'``: a per-file noise probe engages
    vad-scope denoising only when the input measures noisy, so clean audio
    pays one tiny dispatch and nothing else.  The pipeline silently disables
    the stage when no trained enhancer weights ship (random-weight denoising
    would be worse than none)."""

    enabled: bool = True
    backend: str = "gtcrn"            # gtcrn | zipenhancer
    # what consumes the enhanced audio: 'full' = the whole pipeline (the
    # reference's latent design, diarization_baseline.py:333-338); 'vad' =
    # only the VAD sees denoised audio while embeddings run on the raw
    # signal — denoising recovers missed speech under heavy noise (measured:
    # white @10 dB SNR miss 58% -> 0%) but distorts speaker cues, so keeping
    # embeddings raw preserves separability; 'auto' = measure the file's
    # frame-energy floor first and engage vad-scope denoising only when the
    # estimated SNR is below ``auto_snr_db`` (clean files skip the enhancer
    # entirely — zero cost on the common path)
    scope: str = "auto"
    # 'auto' engages enhancement below this estimated SNR (p95/p05 frame
    # energy).  Measured: clean/reverb domains 38.6-61 dB, white @10 dB
    # 12.1 dB, babble @5-15 dB 8.9-16.9 dB — 25 dB splits the gap with
    # >8 dB margin on both sides
    auto_snr_db: float = 25.0
    # Auto-routing between DENOISING and SEPARATION front-ends (VERDICT r3
    # #5): when the auto probe engages enhancement, a second statistic asks
    # whether the background is COMPETING SPEECH (babble) or stationary
    # noise.  Babble needs the demix-dialog separation stem (denoisers
    # preserve the interfering speech and distort speaker identity —
    # measured babble@5 dB DER: raw 26.8%, ZipEnhancer 59%, dialog stem
    # 14.6%); stationary noise keeps the cheap GTCRN vad-scope denoise.
    # The statistic is the SPECTRAL SHAPE of the noise floor: the fraction
    # of the lowest-energy-decile frames' mean power spectrum above 4 kHz.
    # Competing speech is speech-shaped (steep roll-off above ~1-2 kHz),
    # broadband stationary noise is flat (~0.5).  Calibrated by
    # scripts/exp_babble_probe.py (2026-08-20, 3x60 s/domain): babble15
    # 0.046-0.064, babble5 0.099-0.150, white10 0.501-0.502 — route when
    # BELOW the threshold (>3x margin both ways at 0.25).
    # (A frame-energy-modulation statistic was tried first and rejected:
    # at low SNR quiet-speech frames dominate the spread in both domains.)
    auto_route_demix: bool = True
    babble_floor_hf_frac: float = 0.25
    # checkpoint override (.npz); None = the shipped default for the backend
    weights: str | None = None
    # GTCRN long-audio chunking (gtcrn_wrap.py:101-107)
    chunk_s: float = 360.0
    overlap_s: float = 1.0
    # ZipEnhancer windowed inference (zipenhancex.py:16-25)
    window_s: float = 2.0
    hop_ratio: float = 0.75
    batch_size: int = 64


@dataclass(frozen=True)
class ShardingConfig:
    """TPU mesh / parallelism (new; reference has none — SURVEY.md §2.3)."""

    data_axis: str = "dp"
    model_axis: str = "tp"
    # number of chips along each axis; -1 = all available on data axis
    dp: int = -1
    tp: int = 1


@dataclass(frozen=True)
class OverlapConfig:
    """Overlap rescue on the flagship pipeline (segment/overlap.py): the
    PyanNet-class segmentation model detects where >=2 people speak at
    once, and each region gains ONE second-speaker segment (turn-change
    regions take the two adjacent speakers; backchannel regions match the
    region's grid embedding against the other speakers' centroids).  The
    flagship keeps the global speaker map (its confusion is ~5x lower than
    the standalone segmentation engine's stitching, measured r4)."""

    # DEFAULT ON since 2026-08-21 (VERDICT r4 #2), after the paid-for bench
    # pass: with the detector FUSED into the streamed per-chunk program the
    # rescue costs no measurable RTF (bench rescue-ON 707x @600 s / 445x
    # @60 s / 971x corpus vs the r4 rescue-OFF artifact's 687/458/864;
    # DER 0.62/0.00/0.29 unchanged) and the default CLI path emits
    # second-speaker segments (overlap domain 3.97 -> 2.67%).  Non-overlap
    # domains are protected by the ``min_snr_db`` noise veto below; the
    # detector is an exact no-op on clean non-overlap speech (measured
    # ov/speech ratio 0.0, eval_overlap_det).
    enabled: bool = True
    # segmentation checkpoint override (.npz); None = the shipped default
    weights: str | None = None
    chunk_s: float = 5.0
    chunk_hop_s: float = 2.5
    min_on_s: float = 0.3
    min_gap_s: float = 0.15
    # cosine floor for the backchannel second-speaker match
    min_cos: float = 0.10
    # sanity veto: if the model marks more than this fraction of total
    # speech as overlapped, it is hallucinating — skip the rescue
    max_overlap_frac: float = 0.5
    # noise veto: skip the rescue when the file's estimated SNR is below
    # this floor (same statistic and default as the enhance auto-gate and
    # the refine-split floor).  MEASURED 2026-08-21: the conversation-
    # trained detector reads a babble bed as overlapping speech — rescue ON
    # took heldout-babble15 3.48 -> 10.81% while every clean domain was
    # unchanged or improved; under the gate the rescue only runs where its
    # detections are trustworthy.  None disables the veto.
    min_snr_db: float | None = 25.0


@dataclass(frozen=True)
class DiarizationConfig:
    """Top-level config: the single source of truth for all pipelines."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    vad: VadConfig = field(default_factory=VadConfig)
    scd: ScdConfig = field(default_factory=ScdConfig)
    embed: EmbedConfig = field(default_factory=EmbedConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    reseg: ResegConfig = field(default_factory=ResegConfig)
    merge: MergeConfig = field(default_factory=MergeConfig)
    stems: StemsConfig = field(default_factory=StemsConfig)
    enhance: EnhanceConfig = field(default_factory=EnhanceConfig)
    overlap: OverlapConfig = field(default_factory=OverlapConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)


def _hydrate(cls, data: Mapping[str, Any]):
    """Strict keyword hydration (the `dacite.from_dict(strict=True)` idea from
    ``diarization_baseline.py:360-365``): unknown keys raise, wrong nesting raises."""
    if not dataclasses.is_dataclass(cls):
        return data
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for name, value in data.items():
        factory = fields[name].default_factory
        if isinstance(value, Mapping) and factory is not dataclasses.MISSING:
            kwargs[name] = _hydrate(factory, value)
        else:
            kwargs[name] = value
    return cls(**kwargs)


def config_from_dict(data: Mapping[str, Any]) -> DiarizationConfig:
    """Build a :class:`DiarizationConfig` from a (possibly nested) dict, strictly."""
    return _hydrate(DiarizationConfig, data)


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
