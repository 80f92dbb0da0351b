"""CLI + webui-helper tests (no gradio needed)."""
import numpy as np
import pytest

from speech_diarization_tpu.io.audio import write_wav


def _conv_wave(sr=16000):
    g = np.random.default_rng(0)
    parts = []
    for i, f in enumerate([180.0, 850.0, 180.0]):
        parts.append(np.zeros(int(0.5 * sr), np.float32))
        t = np.arange(int(3.0 * sr)) / sr
        parts.append((0.3 * np.sin(2 * np.pi * f * t)
                      + 0.005 * g.standard_normal(len(t))).astype(np.float32))
    parts.append(np.zeros(int(0.5 * sr), np.float32))
    return np.concatenate(parts)


class TestCli:
    @pytest.mark.slow
    def test_diarize_command(self, tmp_path, capsys):
        from speech_diarization_tpu.cli import main

        apath = tmp_path / "conv.wav"
        write_wav(apath, _conv_wave(), 16000)
        rc = main([
            "diarize", str(apath), "--out-dir", str(tmp_path / "out"),
            "--no-loudness-norm", "--cluster-method", "ahc",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "speakers:" in out
        for ext in ["rttm", "json", "srt", "csv"]:
            assert (tmp_path / "out" / f"conv.{ext}").exists()

    def test_config_json_hydration(self, tmp_path):
        import json

        from speech_diarization_tpu.cli import build_config, main

        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps({
            "cluster": {"method": "ahc", "max_speakers": 3},
            "vad": {"on_threshold": 0.7},
        }))
        import argparse

        ns = argparse.Namespace(config=str(cfg_path))
        cfg = build_config(ns)
        assert cfg.cluster.method == "ahc"
        assert cfg.cluster.max_speakers == 3
        assert cfg.vad.on_threshold == 0.7

    def test_strict_config_rejects_unknown(self, tmp_path):
        from speech_diarization_tpu.config import config_from_dict

        with pytest.raises(KeyError):
            config_from_dict({"cluster": {"metod": "ahc"}})

    @pytest.mark.slow
    def test_enhance_command(self, tmp_path, capsys):
        from speech_diarization_tpu.cli import main

        g = np.random.default_rng(0)
        write_wav(tmp_path / "n.wav",
                  (0.1 * g.standard_normal(16000)).astype(np.float32), 16000)
        rc = main(["enhance", str(tmp_path), "--backend", "gtcrn"])
        assert rc == 0
        assert "enhanced 1 files" in capsys.readouterr().out


@pytest.mark.slow
class TestWebuiHelpers:
    def test_normalize_gradio_audio(self):
        from speech_diarization_tpu.webui import normalize_gradio_audio

        y16 = (np.random.default_rng(0).standard_normal((100, 2)) * 1000).astype(np.int16)
        y, sr = normalize_gradio_audio((8000, y16))
        assert sr == 8000
        assert y.dtype == np.float32
        assert y.ndim == 1
        assert np.abs(y).max() <= 1.0

    def test_run_diarize_ui(self):
        from speech_diarization_tpu.webui import run_diarize_ui

        wave = (_conv_wave() * 32768).astype(np.int16)
        fig, df = run_diarize_ui(
            (16000, wave), 0.6, 0.4, 250, 100, 40, 1.5, "ahc", 4,
            0.5, 30.0, 0.8, True,
        )
        assert len(df) >= 1
        assert {"start", "end", "speaker"} <= set(df.columns)
