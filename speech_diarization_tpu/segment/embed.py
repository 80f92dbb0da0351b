"""Embedding extraction over dense window grids (the TPU-first core idea).

The reference launches a separate CUDA batch per processing stage: SCD windows
(``anti_stick_diarize.py:95-100``), per-segment snippets padded to batch max
(``anti_stick_diarize.py:150-169``), and 1 s reassignment windows
(``anti_stick_diarize.py:420-427``) — thousands of host↔device round trips per
file.  Here the waveform is decomposed ONCE into a dense ``[n_windows, win]``
grid; the embedder runs over fixed-size chunks of that grid (one compiled
shape), and every downstream consumer — SCD distances, segment embeddings
(masked-mean matmul), reassignment argmax — reads from the same ``[W, D]``
embedding matrix (SURVEY.md §7.1 items 1-2).

``embed_segments_bucketed`` preserves the reference-style per-segment snippet
embedding (context padding for short segments, ``anti_stick_diarize.py:155-161``;
tile-extension, ``diar_diag.py:344-348``) with power-of-two length bucketing so
jit recompiles stay bounded.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax.numpy as jnp

from ..dsp.framing import frame_signal, num_frames
from ..types import SegmentArray

# encode_fn: [B, win_samples] device array -> [B, D] embeddings
EncodeFn = Callable[[jnp.ndarray], jnp.ndarray]


def window_starts(n_samples: int, sr: int, win_s: float, hop_s: float) -> np.ndarray:
    """Start sample index of each grid window (host ints)."""
    win = int(round(win_s * sr))
    hop = int(round(hop_s * sr))
    n = num_frames(n_samples, win, hop, pad_tail=True)
    return np.arange(n) * hop


def embed_windows(
    encode_fn: EncodeFn,
    y: jnp.ndarray,
    sr: int,
    win_s: float,
    hop_s: float,
    batch: int = 256,
    defer: bool = False,
    max_batch: int | None = None,
) -> np.ndarray | Callable[[], np.ndarray]:
    """Embed every window of the dense grid: [T] -> [n_windows, D].

    Per batch, only the covering waveform span is sliced (on device) and
    framed just-in-time — the full [W, win] frame tensor (a win/hop-fold
    blow-up of the waveform, ~384 MB for an hour of 1 s/100 ms windows) is
    never materialized in HBM.  Every batch shares one compiled shape, so a
    single program serves any file length.

    ``defer=True`` dispatches every batch and returns a zero-arg finisher
    that pulls + concatenates — callers overlap this compute with other
    host/device work (the flagship pipeline runs VAD post-processing on the
    host while the grid computes).
    """
    import jax

    win = int(round(win_s * sr))
    hop = int(round(hop_s * sr))
    w = num_frames(y.shape[-1], win, hop, pad_tail=True)
    if w == 0:
        empty = np.zeros((0, 1), dtype=np.float32)
        return (lambda: empty) if defer else empty
    # Auto-bucket the batch: each dispatch costs a tunnel round trip worth
    # ~DISPATCH_EQUIV windows of encoder compute, so larger batches win for
    # long files while short files still get a single snug dispatch.
    # Candidates are powers-of-two multiples of the caller's batch (its value
    # stays the compile-shape floor, so explicitly small batches in tests
    # keep their small shapes).  The caller's batch is also the CEILING
    # unless ``max_batch`` explicitly opts into larger buckets — compiling a
    # bigger shape can cost many minutes on a cold cache (ADVICE r1), so it
    # must be a deliberate choice (the flagship pipeline opts in via
    # EmbedConfig.max_batch_size).
    DISPATCH_EQUIV = 384
    cap = max(batch, max_batch) if max_batch is not None else batch
    cands = {min(batch << k, cap) for k in range(4)}
    chosen = min(cands, key=lambda b: -(-w // b) * (b + DISPATCH_EQUIV))
    if chosen > batch:
        import logging

        logging.getLogger("sdtpu.embed").info(
            "auto-bucketing embed batch %d -> %d for %d windows (first "
            "compile of a new shape can take minutes without a warm cache)",
            batch, chosen, w)
    batch = chosen
    span = (batch - 1) * hop + win
    n_batches = -(-w // batch)
    needed = (n_batches - 1) * batch * hop + span
    y_pad = jnp.pad(jnp.asarray(y), (0, max(0, needed - y.shape[-1])))

    batch_fn = _get_batch_encode_fn(encode_fn, win, hop, span)
    # dispatch all batches; results stay on device so dispatch i+1 overlaps
    # compute i (eager slices would cost a tunnel round trip each)
    outs = [batch_fn(y_pad, i * batch * hop) for i in range(n_batches)]

    def finish() -> np.ndarray:
        return np.concatenate([np.asarray(o) for o in outs], axis=0)[:w]

    return finish if defer else finish()


# slice+frame+encode wrappers, keyed so traces are reused across files
_BATCH_ENCODE_CACHE: dict = {}


def _get_batch_encode_fn(encode_fn: EncodeFn, win: int, hop: int, span: int):
    """Fused jitted batch step, with an eager fallback for encode functions
    that cannot be traced (host/numpy probes, device_put-ing sharded
    closures).  The fallback surfaces at TRACE time on the first call — no
    device compile is attempted, so it cannot poison the axon process."""
    import jax

    key = (encode_fn, win, hop, span)
    if key not in _BATCH_ENCODE_CACHE:

        @jax.jit
        def _jitted(y_pad, start):
            seg = jax.lax.dynamic_slice_in_dim(y_pad, start, span)
            frames = frame_signal(seg, win, hop, pad_tail=False)
            return encode_fn(frames)

        def _eager(y_pad, start):
            seg = jax.lax.dynamic_slice_in_dim(y_pad, start, span)
            frames = frame_signal(seg, win, hop, pad_tail=False)
            return encode_fn(frames)

        state = {"fn": None}

        def dispatch(y_pad, start):
            if state["fn"] is None:
                try:
                    out = _jitted(y_pad, start)
                    state["fn"] = _jitted
                    return out
                except (jax.errors.TracerArrayConversionError,
                        jax.errors.ConcretizationTypeError,
                        TypeError, ValueError):
                    state["fn"] = _eager
            return state["fn"](y_pad, start)

        _BATCH_ENCODE_CACHE[key] = dispatch
    return _BATCH_ENCODE_CACHE[key]


# jitted streaming-grid chunk functions, keyed so traces are reused
_STREAM_FN_CACHE: dict = {}


def embed_windows_streaming(
    model,
    params,
    y: jnp.ndarray,
    sr: int,
    win_s: float,
    hop_s: float,
    windows_per_chunk: int = 600,
    margin_s: float = 4.0,
    defer: bool = False,
) -> np.ndarray | Callable[[], np.ndarray]:
    """Streaming-trunk grid embeddings: [T] -> [n_windows, D].

    Same contract as :func:`embed_windows`, but the encoder trunk runs ONCE
    per chunk over the raw waveform (``EcapaModel.encode_grid_chunk``) instead
    of once per window — the dense 1 s / 100 ms grid overlaps 10-fold, so this
    removes ~10x redundant trunk FLOPs.  Chunks carry ``margin_s`` of real
    context on each side (> the trunk receptive field incl. sliding-stat
    windows, ~3.4 s), so core windows match an unchunked whole-file pass;
    stitching exactness is tested in tests/test_streaming_ecapa.py.
    """
    import jax

    win = int(round(win_s * sr))
    hop = int(round(hop_s * sr))
    w = num_frames(y.shape[-1], win, hop, pad_tail=True)
    if w == 0:
        empty = np.zeros((0, 1), dtype=np.float32)
        return (lambda: empty) if defer else empty
    wpc = min(windows_per_chunk, 1 << max(6, (w - 1).bit_length()))
    margin = -(-int(round(margin_s * sr)) // hop) * hop
    span = 2 * margin + (wpc - 1) * hop + win

    key = (id(model), _params_key(params), win, hop, wpc, margin)
    if key not in _STREAM_FN_CACHE:

        @jax.jit
        def chunk_fn(y_pad, start):
            seg = jax.lax.dynamic_slice_in_dim(y_pad, start, span)
            return model.encode_grid_chunk(params, seg, wpc, margin, win, hop)

        _STREAM_FN_CACHE[key] = chunk_fn
    chunk_fn = _STREAM_FN_CACHE[key]

    n_chunks = -(-w // wpc)
    needed = margin + ((n_chunks - 1) * wpc + wpc - 1) * hop + win + margin
    y_pad = jnp.pad(jnp.asarray(y), (margin, max(0, needed - margin - y.shape[-1])))
    outs = [chunk_fn(y_pad, c * wpc * hop) for c in range(n_chunks)]

    def finish() -> np.ndarray:
        return np.concatenate([np.asarray(o) for o in outs], axis=0)[:w]

    return finish if defer else finish()


def _params_key(params) -> int:
    """Identity key for a params pytree (leaves are device arrays; the tree
    object itself is rebuilt per load, so key on the first leaf's id)."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    return id(leaves[0]) if leaves else 0


def segment_overlap_weights(
    segs: SegmentArray,
    win_starts_s: np.ndarray,
    win_s: float,
) -> np.ndarray:
    """[S, W] overlap (seconds) of each grid window with each segment."""
    ws = win_starts_s[None, :]  # [1, W]
    we = ws + win_s
    ss = segs.starts[:, None]  # [S, 1]
    se = segs.ends[:, None]
    overlap = np.minimum(we, se) - np.maximum(ws, ss)
    return np.clip(overlap, 0.0, None)


def segment_embeddings_from_grid(
    win_embs: np.ndarray,  # [W, D]
    win_starts_s: np.ndarray,  # [W]
    win_s: float,
    segs: SegmentArray,
    min_overlap_s: float = 0.25,
) -> np.ndarray:
    """Segment embeddings as overlap-weighted means of grid-window embeddings
    (one [S,W]@[W,D] matmul).  Segments too short to fully cover a window fall
    back to the single best-overlapping window — the analog of the reference's
    context padding for short segments (``anti_stick_diarize.py:155-161``)."""
    n = len(segs)
    if n == 0 or win_embs.shape[0] == 0:
        return np.zeros((n, win_embs.shape[1] if win_embs.size else 1), np.float32)
    # Per-segment LOCAL window ranges instead of the dense [S, W] weight
    # matrix: a segment only overlaps windows starting in
    # (start - win_s, end), ~dozens at the 100 ms grid — the dense version
    # allocated 200+ MB and took 32 s of host time at hour scale.  Same
    # math exactly (overlap-seconds weights, sliver threshold, best-window
    # fallback), tested equal in tests/test_segment.py.
    ws = np.asarray(win_starts_s, np.float64)
    starts = np.asarray(segs.starts, np.float64)
    ends = np.asarray(segs.ends, np.float64)
    a_idx = np.searchsorted(ws, starts - win_s, side="right")
    b_idx = np.searchsorted(ws, ends, side="left")
    out = np.zeros((n, win_embs.shape[1]), np.float32)
    for i in range(n):
        a, b = int(a_idx[i]), int(b_idx[i])
        if b <= a:  # no window starts inside: nearest window wins
            j = min(max(a, 0), len(ws) - 1)
            out[i] = win_embs[j]
            continue
        local = ws[a:b]
        ov = np.minimum(ends[i], local + win_s) - np.maximum(starts[i], local)
        w = np.where(ov >= min_overlap_s, ov, 0.0)
        tot = w.sum()
        if tot < 1e-9:  # all slivers: single best-overlapping window
            out[i] = win_embs[a + int(np.argmax(ov))]
            continue
        out[i] = (w / tot) @ win_embs[a:b]
    return out


def _bucket_len(n: int, min_len: int) -> int:
    b = min_len
    while b < n:
        b *= 2
    return b


def embed_segments_bucketed(
    encode_fn: EncodeFn,
    y: np.ndarray,
    sr: int,
    segs: SegmentArray,
    min_duration_ms: float = 500.0,
    pad_duration_ms: float = 150.0,
    batch: int = 32,
    min_bucket_s: float = 0.5,
    max_bucket_s: float = 16.0,
) -> np.ndarray:
    """Reference-style per-segment embeddings with static-shape bucketing.

    Each snippet (context-padded when short) is zero-padded to a power-of-two
    length bucket; snippets are grouped by bucket so each (bucket, batch)
    shape compiles once.  Mirrors ``embed_segments``
    (``anti_stick_diarize.py:130-172``).
    """
    n = len(segs)
    if n == 0:
        return np.zeros((0, 1), dtype=np.float32)
    y = np.asarray(y)
    min_dur = int(min_duration_ms / 1000.0 * sr)
    pad = int(pad_duration_ms / 1000.0 * sr)
    min_bucket = int(min_bucket_s * sr)
    max_bucket = int(max_bucket_s * sr)

    snippets: list[np.ndarray] = []
    for s, e in zip(segs.starts, segs.ends):
        i0, i1 = int(s * sr), int(e * sr)
        if i1 - i0 < min_dur:
            i0, i1 = max(0, i0 - pad), min(len(y), i1 + pad)
        snip = y[i0:i1]
        if len(snip) > max_bucket:  # clamp absurdly long segments
            snip = snip[:max_bucket]
        snippets.append(snip)

    buckets: dict[int, list[int]] = {}
    for i, snip in enumerate(snippets):
        b = min(_bucket_len(max(len(snip), 1), min_bucket), max_bucket)
        buckets.setdefault(b, []).append(i)

    dim: int | None = None
    embs: np.ndarray | None = None
    for blen, idxs in sorted(buckets.items()):
        for j in range(0, len(idxs), batch):
            group = idxs[j : j + batch]
            mat = np.zeros((batch, blen), dtype=np.float32)
            for row, i in enumerate(group):
                s = snippets[i]
                mat[row, : len(s)] = s
            out = np.asarray(encode_fn(jnp.asarray(mat)))
            if embs is None:
                dim = out.shape[1]
                embs = np.zeros((n, dim), dtype=np.float32)
            embs[group] = out[: len(group)]
    assert embs is not None
    return embs
