"""bf16 inference numerics: embeddings must stay directionally faithful
(cosine vs f32) — the precision contract behind the DER-within-0.5 budget
(SURVEY.md §7.4 item 6)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_diarization_tpu.models.ecapa import EcapaModel, EcapaTdnn

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)


def test_bf16_embeddings_track_f32():
    net32 = EcapaTdnn(n_mels=20, channels=64, emb_dim=32, scale=4,
                      se_channels=16, att_channels=16, dtype=jnp.float32)
    net16 = EcapaTdnn(n_mels=20, channels=64, emb_dim=32, scale=4,
                      se_channels=16, att_channels=16, dtype=jnp.bfloat16)
    m32, m16 = EcapaModel(net32), EcapaModel(net16)
    params = m32.init(jax.random.PRNGKey(0))

    g = np.random.default_rng(0)
    wavs = jnp.asarray((0.3 * g.standard_normal((4, 16000))).astype(np.float32))
    e32 = np.asarray(m32.encode_batch(params, wavs))
    e16 = np.asarray(m16.encode_batch(params, wavs))
    assert e16.dtype == np.float32  # f32 out by contract
    a = e32 / np.linalg.norm(e32, axis=1, keepdims=True)
    b = e16 / np.linalg.norm(e16, axis=1, keepdims=True)
    cos = (a * b).sum(axis=1)
    assert cos.min() > 0.98, cos
