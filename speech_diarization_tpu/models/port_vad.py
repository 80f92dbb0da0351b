"""Silero-VAD artifact tooling + the documented retrain fallback.

The reference downloads Silero VAD from torch.hub as an opaque TorchScript
archive (``vad.py:21-27``, ``snakers4/silero-vad``).  TorchScript graphs are
not state_dicts-with-a-published-module: the architecture is only recoverable
from the serialized graph itself.  The porting strategy is therefore
two-tier (SURVEY.md §7.4 item 1 explicitly allows this: "DER target, not
bit-parity, is the contract"):

1. **Artifact inspection + distillation** (when the artifact is available):
   :func:`silero_state_dict` extracts the raw parameter tensors and
   :func:`silero_probs_fn` wraps the TorchScript module as a host oracle, so
   our VadNet can be DISTILLED against it (train on its frame probabilities
   over any audio — no architecture reconstruction needed) via
   :func:`distill_vad_from_silero`.
2. **Retrain fallback** (zero-egress default): ``train/recipes.
   train_vad_synthetic`` ships ``weights/vad_synthetic.npz`` (99.6% heldout
   frame accuracy on the synthetic domain); DER-level parity on real speech
   is then validated by the AMI/VoxConverse harness (scripts/eval_rttm.py)
   once audio artifacts exist.

Gated test: tests/test_models.py::TestSileroArtifact (SDTPU_SILERO_JIT).
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np


def silero_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Extract named parameters/buffers from the TorchScript archive."""
    import torch

    mod = torch.jit.load(str(path), map_location="cpu")
    out: dict[str, np.ndarray] = {}
    for name, p in mod.named_parameters():
        out[name] = p.detach().numpy()
    for name, b in mod.named_buffers():
        out.setdefault(name, b.detach().numpy())
    return out


def silero_probs_fn(path: str | Path, sample_rate: int = 16000) -> Callable:
    """Wrap the TorchScript model as a host oracle: [T] float32 -> [F] probs
    at 32 ms windows (the v4+ streaming contract: 512-sample chunks @16k)."""
    import torch

    mod = torch.jit.load(str(path), map_location="cpu").eval()

    def probs(y: np.ndarray) -> np.ndarray:
        mod.reset_states()
        chunk = 512 if sample_rate == 16000 else 256
        t = (len(y) // chunk) * chunk
        out = []
        with torch.no_grad():
            for i in range(0, t, chunk):
                p = mod(torch.from_numpy(y[i : i + chunk]), sample_rate)
                out.append(float(p))
        return np.asarray(out, np.float32)

    return probs


def distill_vad_from_silero(
    jit_path: str | Path,
    steps: int = 500,
    batch: int = 8,
    dur_s: float = 4.0,
    lr: float = 2e-3,
    seed: int = 0,
    out_path: str | Path | None = None,
):
    """Train our VadNet to match the Silero oracle's frame probabilities on
    synthetic audio (teacher-student distillation — transfers the artifact's
    behavior without reconstructing its TorchScript graph).

    Returns (params, metrics) like ``train_vad_synthetic``.  The student hop
    is 10 ms vs the teacher's 32 ms chunks; teacher targets are repeated to
    the student grid (nearest-frame alignment).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.vad import VadModel
    from ..train.objectives import bce_vad_loss
    from ..train.recipes import _flatten, save_params_npz
    from ..train.synthetic import make_vad_example

    teacher = silero_probs_fn(jit_path)
    model = VadModel()
    params = model.init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)

    hop = int(model.sample_rate * model.hop_ms / 1000.0)  # student frames
    chunk = 512  # teacher frames

    def batch_data():
        wavs, targets = [], []
        for _ in range(batch):
            w, _ = make_vad_example(rng, dur_s)
            tprob = teacher(w)  # [len(w)//512]
            # teacher chunk c covers samples [c*512, (c+1)*512): map each
            # student frame (at f*hop) to its covering teacher chunk
            f_idx = (np.arange(len(w) // hop + 1) * hop // chunk).clip(
                0, len(tprob) - 1)
            wavs.append(w)
            targets.append(tprob[f_idx])
        return jnp.asarray(np.stack(wavs)), jnp.asarray(np.stack(targets))

    def loss_fn(p, wavs, targets):
        probs = model.probs(p, wavs)
        n = min(probs.shape[-1], targets.shape[-1])
        return bce_vad_loss(probs[..., :n], targets[..., :n])

    @jax.jit
    def step(p, o, wavs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(p, wavs, targets)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    metrics = {"loss": []}
    for i in range(steps):
        wavs, targets = batch_data()
        params, opt_state, loss = step(params, opt_state, wavs, targets)
        if (i + 1) % 50 == 0 or i == 0:
            metrics["loss"].append(float(loss))

    # heldout agreement with the teacher
    w, _ = make_vad_example(np.random.default_rng(seed + 1), dur_s)
    tp = teacher(w)
    f_idx = (np.arange(len(w) // hop + 1) * hop // chunk).clip(0, len(tp) - 1)
    sp = np.asarray(model.probs(params, jnp.asarray(w)))
    n = min(len(sp), len(f_idx))
    metrics["teacher_agreement"] = float(
        ((sp[:n] > 0.5) == (tp[f_idx][:n] > 0.5)).mean())

    if out_path is not None:
        save_params_npz(_flatten(params), out_path)
    return params, metrics
