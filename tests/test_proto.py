"""Angular-prototypical objective: correctness properties (train/proto.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.train.proto import angular_proto_loss


def test_perfectly_separated_speakers_give_low_loss():
    """Orthogonal speaker directions with tight utterances → loss ≈ 0 at
    high scale."""
    n, m, d = 4, 3, 16
    basis = np.eye(n, d, dtype=np.float32)
    emb = jnp.asarray(np.repeat(basis[:, None, :], m, axis=1))
    loss = angular_proto_loss(emb, jnp.asarray(30.0), jnp.asarray(0.0))
    assert float(loss) < 1e-3


def test_collapsed_embeddings_give_chance_loss():
    """All utterances identical → every column ties → loss = ln(N)."""
    n, m, d = 5, 3, 16
    v = np.ones((1, 1, d), np.float32)
    emb = jnp.asarray(np.broadcast_to(v, (n, m, d)).copy())
    loss = angular_proto_loss(emb, jnp.asarray(10.0), jnp.asarray(0.0))
    np.testing.assert_allclose(float(loss), np.log(n), rtol=1e-5)


def test_loss_decreases_with_separation():
    rng = np.random.default_rng(0)
    n, m, d = 6, 4, 32
    speaker = rng.standard_normal((n, 1, d)).astype(np.float32)
    noise = rng.standard_normal((n, m, d)).astype(np.float32)
    tight = jnp.asarray(speaker + 0.1 * noise)
    loose = jnp.asarray(speaker + 2.0 * noise)
    s, b = jnp.asarray(10.0), jnp.asarray(-5.0)
    assert float(angular_proto_loss(tight, s, b)) < float(
        angular_proto_loss(loose, s, b))


def test_gradients_finite():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((3, 2, 8)).astype(np.float32))

    def f(e, s, b):
        return angular_proto_loss(e, s, b)

    g = jax.grad(f, argnums=(0, 1, 2))(emb, jnp.asarray(10.0),
                                       jnp.asarray(-5.0))
    for t in g:
        assert bool(jnp.isfinite(t).all())


def test_leave_one_out_excludes_query():
    """The own-speaker column must use the leave-one-out centroid: with
    M=2 and two anti-correlated utterances, a full centroid would be ~0
    while LOO gives cos=-1 exactly."""
    d = 8
    a = np.zeros((1, 2, d), np.float32)
    a[0, 0, 0] = 1.0
    a[0, 1, 0] = -1.0
    # single speaker → softmax over 1 class is degenerate; add a far speaker
    b = np.zeros((1, 2, d), np.float32)
    b[:, :, 1] = 1.0
    emb = jnp.asarray(np.concatenate([a, b], axis=0))
    loss = angular_proto_loss(emb, jnp.asarray(1.0), jnp.asarray(0.0))
    # query a0 vs its LOO centroid (= a1) has cos -1; vs speaker-b centroid
    # cos 0 → own-column logit must be the smaller one for speaker a
    assert float(loss) > np.log(2.0)  # worse than chance for the a rows
