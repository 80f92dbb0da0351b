"""Held-out-domain DER regression gates (VERDICT r1 weak-1 'Done' criterion).

Pins the production pipeline's accuracy on speech the models never trained
on (train/heldout.py LPC source-filter voices) next to the in-domain
generator, with the SHIPPED weights named explicitly so a default-weights
change cannot silently move these gates.  Bounds are ~2x the measured means
(eval_heldout 2026-08-17: heldout-dry 7.8%, indomain r1 1.2%) — they catch
regressions of the honest accuracy signal, not noise.
"""
from pathlib import Path

import numpy as np
import pytest

import jax

from speech_diarization_tpu.metrics import diarization_error_rate
from speech_diarization_tpu.types import SegmentArray

pytestmark = pytest.mark.slow  # ~minutes on CPU; part of the full suite only

WROOT = Path(__file__).resolve().parents[1] / "weights"
PROTO = next((WROOT / n for n in
              ("ecapa_robust_stream.npz", "ecapa_proto_small.npz",
               "ecapa_proto2_stream.npz")
              if (WROOT / n).exists()), None)
R1 = WROOT / "ecapa_synthetic_full_stream.npz"
MC_VAD = WROOT / "vad_conv_mc.npz"


def _pipeline(enc_path, vad_path):
    from functools import partial

    from speech_diarization_tpu.config import ClusterConfig, DiarizationConfig
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.recipes import load_speaker_encoder, load_vad

    model, params = load_speaker_encoder(enc_path)
    vad, vp = load_vad(vad_path)
    cfg = DiarizationConfig(cluster=ClusterConfig(method="spectral",
                                                  max_speakers=8))
    return DiarizationPipeline(cfg, encoder=(model, params),
                               vad_probs_fn=jax.jit(partial(vad.probs, vp)))


def _score(pipe, wave, truth):
    s, e, k = truth
    res = pipe((wave, 16000))
    return diarization_error_rate(
        SegmentArray(s, e, k), res.segments, collar_s=0.25).der


@pytest.mark.skipif(PROTO is None or not MC_VAD.exists(),
                    reason="robust weights not shipped")
def test_heldout_dry_der_under_15pct():
    """The robust encoder + MC VAD on UNSEEN LPC voices.

    RE-PINNED 2026-08-18: the mixed-family cold-trained encoder
    (ecapa_proto_small) measures 1.5% mean on this domain (was 30-45%
    for the broken-crest-warm-started encoders); the chip-continued
    ecapa_robust_stream measures 2.14% — gate at 10% so sample noise
    passes but any return of the confusion failure mode fails."""
    from speech_diarization_tpu.train.heldout import make_conversation_heldout

    pipe = _pipeline(PROTO, MC_VAD)
    ders = []
    for i in range(2):
        rng = np.random.default_rng(1000 + i)
        wave, truth = make_conversation_heldout(rng, 60.0, n_speakers=3,
                                                sr=16000)
        ders.append(_score(pipe, wave, truth))
    assert float(np.mean(ders)) < 0.10, ders


@pytest.mark.skipif(PROTO is None or PROTO.name != "ecapa_robust_stream.npz"
                    or not MC_VAD.exists(),
                    reason="robust default encoder not shipped")
def test_robust_encoder_indomain_distribution():
    """The SHIPPED DEFAULT encoder must hold the in-domain quality bar that
    made r1 the previous default (the robust encoder replaced it only
    because it measured 0.53% in-domain vs r1's 0.64 — eval_heldout
    2026-08-18).  Same heavy-tail seeds and gates as the r1 test below."""
    from speech_diarization_tpu.train.synthetic import make_conversation

    pipe = _pipeline(PROTO, MC_VAD)
    ders = []
    for i in range(6):
        rng = np.random.default_rng(2000 + i)
        wave, truth = make_conversation(rng, 60.0, n_speakers=3, sr=16000)
        ders.append(_score(pipe, wave, truth))
    assert float(np.median(ders)) < 0.03, ders
    assert float(np.mean(ders)) < 0.15, ders


# ---------------------------------------------------------------------------
# Every measured held-out domain gets a gate (VERDICT r3 #4: reverb/white/
# babble/overlap were measured in scripts/eval_heldout.py tables but ungated —
# a regression in the refine vetoes or the demix front-end would pass CI
# silently).  Bounds ~2x the CPU-f32 measured means (STATUS 2026-08-19:
# reverb3 0.00, reverb6 0.66, white10 0.28, babble15 5.24, overlap 3.97) with
# a small absolute floor for the zero-mean domains.
# ---------------------------------------------------------------------------

_DOMAIN_GATES = [
    # (domain kwargs for make_conversation_heldout, mean-DER bound)
    pytest.param({"rt60_s": 0.3}, 0.04, id="reverb3"),
    pytest.param({"rt60_s": 0.6}, 0.04, id="reverb6"),
    pytest.param({"snr_db": 10.0, "noise_kind": "white"}, 0.04, id="white10"),
    pytest.param({"snr_db": 15.0, "noise_kind": "babble"}, 0.11, id="babble15"),
    pytest.param({"overlap_frac": 0.3}, 0.10, id="overlap"),
]


@pytest.fixture(scope="module")
def production_pipe():
    if PROTO is None or not MC_VAD.exists():
        pytest.skip("robust weights not shipped")
    return _pipeline(PROTO, MC_VAD)


@pytest.mark.parametrize("kw,bound", _DOMAIN_GATES)
def test_heldout_domain_der(production_pipe, kw, bound):
    from speech_diarization_tpu.train.heldout import make_conversation_heldout

    ders = []
    for i in range(2):
        rng = np.random.default_rng(1000 + i)
        wave, truth = make_conversation_heldout(rng, 60.0, n_speakers=3,
                                                sr=16000, **kw)
        ders.append(_score(production_pipe, wave, truth))
    assert float(np.mean(ders)) < bound, (kw, ders)


def test_babble5_with_demix_frontend():
    """The babble@5 dB rescue via the SEPARATION front-end (STATUS
    2026-08-19: raw 26.8% -> dialog-stem 14.6% with the chip demixer).
    Needs a separation-GRADE demixer (demix_mc.npz via `make weights`, or
    ported .th ensembles): the committed demix_synthetic fallback measures
    100% DER (its dialog stem is the mixture attenuated ~160x — the same
    measurement that gates the auto-route in
    DiarizationPipeline._demix_frontend), so this skips without one."""
    if PROTO is None or not MC_VAD.exists():
        pytest.skip("robust weights not shipped")
    import os

    from speech_diarization_tpu.utils.weights import WEIGHTS_ROOT

    has_ported = bool(
        [p for p in os.environ.get("SDTPU_DEMUCS_CKPTS", "").split(":") if p]
        or sorted(WEIGHTS_ROOT.glob("*.th")))
    if not has_ported and not (WEIGHTS_ROOT / "demix_mc.npz").exists():
        pytest.skip("no separation-grade demixer (run `make weights`)")
    from functools import partial

    from speech_diarization_tpu.config import (
        ClusterConfig, DiarizationConfig, EnhanceConfig,
    )
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.heldout import make_conversation_heldout
    from speech_diarization_tpu.train.recipes import load_speaker_encoder, load_vad

    model, params = load_speaker_encoder(PROTO)
    vad, vp = load_vad(MC_VAD)
    cfg = DiarizationConfig(
        cluster=ClusterConfig(method="spectral", max_speakers=8),
        enhance=EnhanceConfig(enabled=True, backend="demix-dialog",
                              scope="full"))
    pipe = DiarizationPipeline(cfg, encoder=(model, params),
                               vad_probs_fn=jax.jit(partial(vad.probs, vp)))
    ders = []
    for i in range(2):
        rng = np.random.default_rng(1000 + i)
        wave, truth = make_conversation_heldout(
            rng, 60.0, n_speakers=3, sr=16000, snr_db=5.0,
            noise_kind="babble")
        ders.append(_score(pipe, wave, truth))
    assert float(np.mean(ders)) < 0.60, ders


def test_overlap_rescue_on_overlap_domain():
    """The overlap-rescue stage (segment/overlap.py) with a
    conversation-trained detector must IMPROVE (or at worst match) the
    flagship on the overlap domain — its whole purpose is recovering the
    overlap-miss floor.  Relative gate so it tracks encoder improvements.
    Skips without ``segmentation_conv.npz``: the xf checkpoint hallucinates
    overlap on out-of-family audio and the sanity cap correctly vetoes it
    (measured 2026-08-20), so the stage is a no-op under older weights."""
    conv = WROOT / "segmentation_conv.npz"
    if PROTO is None or not MC_VAD.exists():
        pytest.skip("robust weights not shipped")
    if not conv.exists():
        pytest.skip("no conversation-trained overlap detector "
                    "(chip_queue11 trains segmentation_conv.npz)")
    from functools import partial

    from speech_diarization_tpu.config import (
        ClusterConfig, DiarizationConfig, OverlapConfig,
    )
    from speech_diarization_tpu.pipelines.diarize import DiarizationPipeline
    from speech_diarization_tpu.train.heldout import make_conversation_heldout
    from speech_diarization_tpu.train.recipes import load_speaker_encoder, load_vad

    model, params = load_speaker_encoder(PROTO)
    vad, vp = load_vad(MC_VAD)
    vad_fn = jax.jit(partial(vad.probs, vp))
    pipes = {}
    for on in (False, True):
        cfg = DiarizationConfig(
            cluster=ClusterConfig(method="spectral", max_speakers=8),
            overlap=OverlapConfig(enabled=on, weights=str(conv)))
        pipes[on] = DiarizationPipeline(cfg, encoder=(model, params),
                                        vad_probs_fn=vad_fn)
    on_ders, off_ders = [], []
    for i in range(2):
        rng = np.random.default_rng(1000 + i)
        wave, truth = make_conversation_heldout(
            rng, 60.0, n_speakers=3, sr=16000, overlap_frac=0.3)
        off_ders.append(_score(pipes[False], wave, truth))
        on_ders.append(_score(pipes[True], wave, truth))
    assert float(np.mean(on_ders)) <= float(np.mean(off_ders)) + 0.005, (
        on_ders, off_ders)


@pytest.mark.skipif(not R1.exists() or not MC_VAD.exists(),
                    reason="r1 weights not shipped")
def test_indomain_der_distribution():
    """The in-domain champion (r1 streaming encoder) + MC VAD on the
    in-domain generator.  60 s 3-speaker files have a heavy tail: randomly
    drawn speaker profiles occasionally nearly collide in (f0, formant)
    space and the pair merges (measured across seeds 2000-2005:
    [26.2, 1.3, 1.0, 0.0, 4.8, 16.4]% — mean 8.3%, median 1.1%; at 600 s
    the window-bisection refine rescues these, 0.21% corpus mean).  Gate
    the MEDIAN tightly (typical file must stay excellent) and the MEAN
    loosely (the tail must not grow)."""
    from speech_diarization_tpu.train.synthetic import make_conversation

    pipe = _pipeline(R1, MC_VAD)
    ders = []
    for i in range(6):
        rng = np.random.default_rng(2000 + i)
        wave, truth = make_conversation(rng, 60.0, n_speakers=3, sr=16000)
        ders.append(_score(pipe, wave, truth))
    assert float(np.median(ders)) < 0.03, ders
    assert float(np.mean(ders)) < 0.15, ders
