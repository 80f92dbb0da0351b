"""Training-state checkpointing (orbax) + inference-weight snapshots (npz).

The reference's entire checkpoint story is ``torch.load(...)['model']``
(``gtcrn_wrap.py:13-15``) plus skip-if-output-exists file resume (SURVEY.md §5
'Checkpoint / resume').  The framework keeps that file-granular resume for
batch jobs (``pipelines/baseline.run_batch``, ``pipelines/enhance.enhance_batch``)
and adds real training checkpointing: orbax for sharded ``TrainState`` trees
(restores onto any mesh layout) and flat npz for portable inference weights.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

from .steps import TrainState


def save_train_state(path: str | Path, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
    }, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str | Path, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(template.params),
        "opt_state": jax.device_get(template.opt_state),
        "step": 0,
    }
    restored = ckptr.restore(path, target)
    return TrainState(restored["params"], restored["opt_state"], restored["step"])


def export_inference_weights(path: str | Path, params: Any) -> None:
    """Flatten a (possibly nested) param tree into the portable npz format of
    ``models/port.py`` (keys = '/'-joined paths for nested trees)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(kp, simple=True, separator="/")
        flat[key] = np.asarray(leaf)
    np.savez(str(path), **flat)
