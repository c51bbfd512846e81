"""Offline transcription CLI: flag plumbing, output formats, draft wiring.

Uses an injected small config in WHISPER_CONFIGS so the test stays fast on
CPU (the catalog sizes are too big for the suite budget)."""

import json
import wave

import numpy as np
import pytest

from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, WhisperConfig


@pytest.fixture(scope="module")
def small_catalog():
    WHISPER_CONFIGS["_test-small"] = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    WHISPER_CONFIGS["_test-draft"] = WHISPER_CONFIGS["_test-small"].replace(
        n_text_layer=1
    )
    yield
    WHISPER_CONFIGS.pop("_test-small", None)
    WHISPER_CONFIGS.pop("_test-draft", None)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "test.wav"
    sr = 16000
    t = np.arange(sr * 3) / sr
    a = (0.25 * np.sin(2 * np.pi * 180 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 3.5 * t))).astype(np.float32)
    w = wave.open(str(path), "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(sr)
    w.writeframes((a * 32767).astype(np.int16).tobytes())
    w.close()
    return str(path)


def test_cli_json_output(small_catalog, wav_path, tmp_path):
    from whisperlive_tpu.cli.transcribe import main

    out = tmp_path / "out"
    rc = main([
        wav_path, "--model", "_test-small", "--language", "en",
        "--no_gates", "--max_new_tokens", "12",
        "-f", "json", "-o", str(out),
    ])
    assert rc == 0
    data = json.loads((out / "test.json").read_text())
    assert data["language"] == "en"
    assert data["duration"] == pytest.approx(3.0)
    assert isinstance(data["segments"], list)


def test_cli_speculative_draft(small_catalog, wav_path, capsys):
    from whisperlive_tpu.cli.transcribe import main

    rc = main([
        wav_path, "--model", "_test-small", "--draft_model", "_test-draft",
        "--spec_k", "3", "--language", "en", "--no_gates",
        "--max_new_tokens", "8", "-f", "txt",
    ])
    assert rc == 0
    assert f"== {wav_path} ==" in capsys.readouterr().out


def test_cli_unknown_model_exits(small_catalog, wav_path):
    from whisperlive_tpu.cli.transcribe import main

    with pytest.raises(SystemExit):
        main([wav_path, "--model", "no-such-size"])
