"""Synthetic-data training recipes + shipped-weight loading."""
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from speech_diarization_tpu.train.recipes import load_vad_weights, train_vad_synthetic
from speech_diarization_tpu.train.synthetic import (
    make_speaker_bank,
    make_speaker_batch,
    make_vad_example,
    synth_speech_like,
)

WEIGHTS = Path(__file__).resolve().parents[1] / "weights" / "vad_synthetic.npz"


class TestSyntheticData:
    def test_vad_example_labels_align(self):
        rng = np.random.default_rng(0)
        # preprocess_aug off: this test asserts the generator's raw
        # speech-vs-noise energy structure, which gain augmentation hides
        wave, labels = make_vad_example(rng, dur_s=4.0, preprocess_aug=False)
        assert wave.shape == (64000,)
        assert 0.1 < labels.mean() < 0.9  # both classes present
        # labeled speech frames should carry much more energy
        hop = 160
        frame_e = np.array([
            np.mean(wave[i * hop : i * hop + 400] ** 2)
            for i in range(len(labels) - 3)
        ])
        sp = frame_e[labels[: len(frame_e)] > 0.5].mean()
        ns = frame_e[labels[: len(frame_e)] <= 0.5].mean()
        # negatives deliberately include loud noise, so the margin is modest —
        # the VAD must learn structure, not just energy
        assert sp > 2 * ns

    def test_speaker_bank_distinct(self):
        rng = np.random.default_rng(1)
        bank = make_speaker_bank(rng, 4)
        wavs, labels = make_speaker_batch(rng, bank, batch=8)
        assert wavs.shape[0] == 8 and labels.shape == (8,)

    def test_speech_like_is_harmonic(self):
        """Pitch drift smears exact harmonic positions; assert a peaky
        (harmonic) spectrum instead of exact multiples."""
        rng = np.random.default_rng(2)
        w = synth_speech_like(rng, 1.0, f0=150.0)
        spec = np.abs(np.fft.rfft(w))
        crest = spec.max() / (spec.mean() + 1e-9)
        noise = rng.standard_normal(len(w))
        nspec = np.abs(np.fft.rfft(noise))
        ncrest = nspec.max() / (nspec.mean() + 1e-9)
        assert crest > 4 * ncrest


class TestTrainedVad:
    def test_short_training_improves(self):
        params, metrics = train_vad_synthetic(steps=40, batch=4, eval_every=20)
        assert metrics["loss"][-1] < metrics["loss"][0]
        assert metrics["frame_accuracy"] > 0.8

    def test_shipped_weights_load_and_work(self):
        assert WEIGHTS.exists(), "weights/vad_synthetic.npz must ship with the repo"
        from speech_diarization_tpu.models.vad import VadModel

        params = load_vad_weights(WEIGHTS)
        model = VadModel()
        rng = np.random.default_rng(3)
        # preprocess_aug off: this test asserts the generator's raw
        # speech-vs-noise energy structure, which gain augmentation hides
        wave, labels = make_vad_example(rng, dur_s=4.0, preprocess_aug=False)
        probs = np.asarray(model.probs(params, jnp.asarray(wave)))
        n = min(len(probs), len(labels))
        acc = ((probs[:n] > 0.5) == (labels[:n] > 0.5)).mean()
        assert acc > 0.9
