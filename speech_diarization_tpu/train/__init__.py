"""Training steps (new capability — the reference is inference-only,
SURVEY.md §7.5 — but the framework must be able to (re)train its own VAD and
speaker encoders since the reference's checkpoints are third-party downloads)."""
from .objectives import aam_softmax_loss, si_snr_loss, bce_vad_loss
from .steps import make_ecapa_train_step, make_gtcrn_train_step, TrainState

__all__ = [
    "aam_softmax_loss",
    "si_snr_loss",
    "bce_vad_loss",
    "make_ecapa_train_step",
    "make_gtcrn_train_step",
    "TrainState",
]
