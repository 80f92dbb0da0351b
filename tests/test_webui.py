"""Web UI backend (C27): the slider-wired diarize function runs headless
(gradio itself is optional; the compute path is plain Python)."""
import numpy as np
import pytest

from speech_diarization_tpu.train.synthetic import make_tone_conversation
from speech_diarization_tpu.webui import normalize_gradio_audio, run_diarize_ui

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)


class TestNormalize:
    def test_int16_stereo(self):
        y = (np.random.default_rng(0).integers(-32768, 32767, size=(1000, 2))
             .astype(np.int16))
        out, sr = normalize_gradio_audio((16000, y))
        assert sr == 16000 and out.dtype == np.float32 and out.ndim == 1
        assert np.abs(out).max() <= 1.0


class TestRunDiarizeUi:
    def test_end_to_end(self):
        pytest.importorskip("matplotlib")
        pytest.importorskip("pandas")
        wave, _ = make_tone_conversation(0)
        audio = (16000, (wave * 32767).astype(np.int16))
        # the reference web UI crashed on mismatched kwargs
        # (diarize-webui.py:49-66, SURVEY §2.5 item 3); ours is wired to the
        # real config schema — this drives the exact slider signature
        fig, table = run_diarize_ui(
            audio,
            0.5, 0.35, 250, 100, 30,      # vad on/off/min-speech/min-sil/pad
            1.5, "ahc", 6, 0.5, 30.0,     # scd thr, cluster, max spk, gaps
            0.8, True,                    # merge mincos, reseg
        )
        assert fig is not None
        assert len(table) >= 1
