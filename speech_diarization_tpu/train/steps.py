"""Sharded training steps (dp × tp mesh, GSPMD collectives).

The training step is jitted over a `jax.sharding.Mesh`: the batch is sharded
along 'dp', selected large parameters (ECAPA MFA/attention convs and the
AAM-softmax class prototypes) along 'tp'.  XLA inserts the all-reduces for
gradients and the all-gathers where layouts meet — no explicit collectives in
user code (the scaling-book recipe; the reference has no distributed layer to
mirror, SURVEY.md §2.3).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dsp.mel import fbank_batch
from ..models.ecapa import EcapaTdnn
from ..models.gtcrn import GTCRN
from .objectives import aam_softmax_loss, si_snr_loss

# parameter keys whose leading (output) dim is sharded over 'tp'
ECAPA_TP_PATTERNS = ("mfa", "att_w1", "att_w2", "fc_w", "classifier")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "opt_state", "step"],
    meta_fields=[],
)
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array | int = 0


def _spec_tree(params, mesh: Mesh, tp_patterns) -> Any:
    from ..parallel.sharding import param_partition_specs

    return param_partition_specs(params, mesh, tp_patterns)


def make_ecapa_train_step(
    mesh: Mesh,
    net: EcapaTdnn,
    n_classes: int,
    optimizer: optax.GradientTransformation | None = None,
    sample_rate: int = 16000,
):
    """Build (init_fn, step_fn) for sharded ECAPA speaker-ID training.

    step_fn(state, wavs [B, T] dp-sharded, labels [B]) -> (state, loss).
    The classifier prototype matrix [n_classes, D] is tp-sharded (vocab-style).
    """
    optimizer = optimizer or optax.adamw(1e-3)

    def init_fn(key) -> TrainState:
        k1, k2 = jax.random.split(key)
        params = net.init(k1)
        params["classifier"] = (
            jax.random.normal(k2, (n_classes, net.emb_dim), jnp.float32) * 0.05
        )
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state, 0)

    def loss_fn(params, wavs, labels):
        feats = fbank_batch(wavs, sample_rate=sample_rate, n_mels=net.n_mels)
        emb = net.apply(params, feats, train=True)
        return aam_softmax_loss(emb, params["classifier"], labels)

    def step_fn(state: TrainState, wavs, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, wavs, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def shard_state(state: TrainState) -> TrainState:
        pspecs = _spec_tree(state.params, mesh, ECAPA_TP_PATTERNS)
        params = jax.tree.map(jax.device_put, state.params, pspecs)
        # optimizer state mirrors the param layout where shapes match
        def put_opt(leaf):
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        opt_state = jax.tree.map(put_opt, state.opt_state)
        return TrainState(params, opt_state, state.step)

    batch_sharding = NamedSharding(mesh, P("dp"))
    jitted = jax.jit(step_fn, donate_argnums=(0,))

    def sharded_step(state: TrainState, wavs: np.ndarray, labels: np.ndarray):
        wavs = jax.device_put(jnp.asarray(wavs), batch_sharding)
        labels = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P("dp")))
        with mesh:
            return jitted(state, wavs, labels)

    return init_fn, sharded_step, shard_state


def make_gtcrn_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation | None = None,
    n_fft: int = 512,
    hop: int = 256,
):
    """Sharded GTCRN enhancement training: noisy/clean waveform pairs
    dp-sharded, SI-SNR objective through STFT→net→iSTFT."""
    from ..dsp.stft import istft_ri, stft_ri

    optimizer = optimizer or optax.adamw(1e-3)
    net = GTCRN()

    def init_fn(key) -> TrainState:
        from ..models.gtcrn import gtcrn_init_params

        params = gtcrn_init_params(key)
        return TrainState(params, optimizer.init(params), 0)

    def loss_fn(params, noisy, clean):
        spec = stft_ri(noisy, n_fft, hop)  # [B, F, T, 2]
        enh = net.apply(params, spec)
        wav = istft_ri(enh, n_fft, hop, length=noisy.shape[-1])
        return si_snr_loss(wav, clean)

    def step_fn(state: TrainState, noisy, clean):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, noisy, clean)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    batch_sharding = NamedSharding(mesh, P("dp"))
    jitted = jax.jit(step_fn, donate_argnums=(0,))

    def sharded_step(state: TrainState, noisy, clean):
        noisy = jax.device_put(jnp.asarray(noisy), batch_sharding)
        clean = jax.device_put(jnp.asarray(clean), batch_sharding)
        with mesh:
            return jitted(state, noisy, clean)

    return init_fn, sharded_step
