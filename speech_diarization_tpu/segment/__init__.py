"""L2a — segmentation: VAD post-processing, speaker-change detection,
segment merging, and frame-level reassignment (SURVEY.md layer map L2)."""
from .vad_post import (
    apply_energy_veto,
    frame_energy_db_chunk,
    vad_segments_from_probs,
)
from .embed import (
    window_starts,
    embed_windows,
    embed_windows_streaming,
    segment_embeddings_from_grid,
    embed_segments_bucketed,
)
from .scd import scd_split
from .merge import (
    merge_adjacent,
    conservative_merge,
    merge_same_speaker,
    adjust_segment_boundaries,
    filter_short_segments,
)
from .reassign import speaker_centroids, frame_reassign

__all__ = [
    "apply_energy_veto",
    "frame_energy_db_chunk",
    "vad_segments_from_probs",
    "window_starts",
    "embed_windows",
    "embed_windows_streaming",
    "segment_embeddings_from_grid",
    "embed_segments_bucketed",
    "scd_split",
    "merge_adjacent",
    "conservative_merge",
    "merge_same_speaker",
    "adjust_segment_boundaries",
    "filter_short_segments",
    "speaker_centroids",
    "frame_reassign",
]
