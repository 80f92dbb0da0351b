"""Batch Diarizer with stems export — the pyannote-scaffold pipeline's mirror.

Capability mirror of ``diarization_baseline.Diarizer``
(``diarization_baseline.py:283-346``) and its batch CLI ``main``
(``diarization_baseline.py:349-376``): min/max-speaker bounded clustering,
short-segment filter, same-speaker merging, boundary padding into silence,
RTTM export, per-speaker stems, skip-if-output-exists resume over directory
trees.

Instead of pyannote's PyanNet-segmentation + swapped ONNX embedder (a torch→
numpy→ONNX→torch round trip per chunk, ``ecapa_annote.py:31-33``), the
segmentation/embedding engine is the flagship TPU pipeline with AHC
clustering bounded by min/max speakers (clustering_threshold ~ 0.7, the
baseline's knob at ``diarization_baseline.py:180``).
"""
from __future__ import annotations

from pathlib import Path


from ..config import DiarizationConfig, ClusterConfig
from ..io.audio import read_audio
from ..io.stems import extract_speaker_stems
from ..io.walk import expand_audios
from ..io.writers import write_rttm
from ..segment.merge import (
    adjust_segment_boundaries,
    filter_short_segments,
    merge_same_speaker,
)
from ..types import SegmentArray
from ..utils.logging import get_logger
from .diarize import DiarizationPipeline

log = get_logger("baseline")


class Diarizer:
    """Batch wav→(segments, stems) processor.

    ``engine='flagship'`` (default) runs the VAD+SCD+cluster pipeline;
    ``engine='segmentation'`` runs the PyanNet-class chunk-local
    speaker-activity engine (pipelines/segmentation.py) — the analog of the
    reference's pyannote-3.1 scaffold (``diarization_baseline.py:170-181``),
    overlap-aware."""

    def __init__(self, cfg: DiarizationConfig | None = None,
                 engine: str = "flagship",
                 seg_weights: str | Path | None = None,
                 **pipeline_kwargs):
        if cfg is None:
            cfg = DiarizationConfig(
                cluster=ClusterConfig(method="ahc", min_speakers=2, max_speakers=6,
                                      cos_threshold=0.70),
            )
        self.cfg = cfg
        self.engine = engine
        self.pipeline = DiarizationPipeline(cfg, **pipeline_kwargs)
        if engine == "segmentation":
            from functools import partial

            import jax

            from ..models.segmentation import SegmentationModel
            from .segmentation import SegmentationConfig

            model = SegmentationModel()
            from ..utils.weights import WEIGHTS_ROOT, prefer_weights

            # conv = the full-budget conversation-mix xf checkpoint
            # (chip_queue13): seg-eval-v1 frame 0.8905/0.8958/0.9042
            # (indomain/multicond/conversation) and — with the spectral
            # engine default — pipeline DER 9.41% vs the flagship's 10.77%
            # on overlapping files (2026-08-21); ow3 keeps 0.9025 indomain
            # but collapses on conversations (0.604)
            seg_weights = seg_weights or prefer_weights(
                ("segmentation_conv.npz", "segmentation_ow3.npz",
                 "segmentation_powerset.npz", "segmentation_mc.npz",
                 "segmentation_synthetic.npz")
            ) or WEIGHTS_ROOT / "segmentation_synthetic.npz"
            if Path(seg_weights).exists():
                from ..train.recipes import load_segmentation

                model, params = load_segmentation(seg_weights)
            else:
                log.warning(
                    "segmentation engine: %s missing — RANDOM weights, "
                    "activities will be meaningless. Train via "
                    "train/recipes.train_segmentation_synthetic.", seg_weights)
                params = model.init(jax.random.PRNGKey(0))
            from .segmentation import make_seg_activities_fn

            # dual soft+hard scorer: powerset checkpoints binarize on the
            # argmax decode (see SegNet.apply_hard)
            self._seg_fn = make_seg_activities_fn(model, params)
            self._seg_cfg = SegmentationConfig(
                cos_threshold=cfg.cluster.cos_threshold,
                min_speakers=cfg.cluster.min_speakers or 1,
                max_speakers=cfg.cluster.max_speakers or 8,
                merge_gap_s=cfg.merge.max_gap_s,
            )

    def diarize(self, source, rttm_path: str | Path | None = None) -> SegmentArray:
        """Segments with min-duration filter + time sort
        (``Diarizer.diarize``, ``diarization_baseline.py:289-303``)."""
        if self.engine == "segmentation":
            from .segmentation import segmentation_diarize

            y, sr = read_audio(source, target_sr=self.cfg.audio.sample_rate,
                               mono=True)
            segs = segmentation_diarize(
                y, sr, self._seg_fn, self.pipeline.encode_fn, self._seg_cfg)
        else:
            segs = self.pipeline(source).segments
        segs = filter_short_segments(segs, self.cfg.merge.min_speech_s)
        segs = segs.sort()
        if rttm_path is not None:
            write_rttm(rttm_path, segs)
        return segs

    def merge_segments(self, segs: SegmentArray) -> SegmentArray:
        return merge_same_speaker(
            segs, self.cfg.stems.max_gap_s, self.cfg.stems.max_segment_s
        )

    def pad_segments(self, segs: SegmentArray) -> SegmentArray:
        return adjust_segment_boundaries(
            segs, padding_s=self.cfg.stems.fade_ms * 2 / 1000.0
        )

    def extract_speakers(
        self, segs: SegmentArray, source, root: str | Path, stem_name: str = "audio"
    ) -> dict:
        y, sr = read_audio(source, target_sr=self.cfg.audio.sample_rate, mono=True)
        st = self.cfg.stems
        return extract_speaker_stems(
            y, sr, segs, root,
            max_segment_s=st.max_segment_s, max_gap_s=st.max_gap_s,
            fade_ms=st.fade_ms, min_stem_s=st.min_stem_s, stem_name=stem_name,
        )

    def __call__(
        self, audio_path: str | Path, root: str | Path, with_rttm: bool = False
    ) -> tuple[SegmentArray, dict]:
        audio_path = Path(audio_path)
        rttm = audio_path.with_suffix(".rttm") if with_rttm else None
        segs = self.diarize(audio_path, rttm)
        segs = self.merge_segments(segs)
        segs = self.pad_segments(segs)
        info = self.extract_speakers(segs, audio_path, root, stem_name=audio_path.stem)
        return segs, info


def run_batch(
    root: str | Path,
    cfg: DiarizationConfig | None = None,
    with_rttm: bool = True,
    engine: str = "flagship",
    **pipeline_kwargs,
) -> list[tuple[Path, int]]:
    """Directory batch with skip-if-done resume
    (``diarization_baseline.py:370-376``): a file whose ``.rttm`` already
    exists is skipped."""
    diarizer = Diarizer(cfg, engine=engine, **pipeline_kwargs)
    audios, aroot = expand_audios(Path(root))
    # don't re-ingest our own stem outputs on a resumed run
    audios = [a for a in audios
              if not any(part.endswith("-speakers") for part in a.parts)]
    log.info("batch: %d files under %s", len(audios), aroot)
    done = []
    for apath in audios:
        if apath.with_suffix(".rttm").exists():
            log.info("skip (rttm exists): %s", apath)
            continue
        troot = apath.with_name(f"{apath.stem}-speakers")
        segs, _ = diarizer(apath, troot, with_rttm)
        log.info("%s -> %d segments", apath, len(segs))
        done.append((apath, len(segs)))
    return done
