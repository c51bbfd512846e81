"""Client library unit tests (mocked websocket, mirroring the reference's
test_client.py strategy)."""

import json
import time
from unittest import mock

import numpy as np
import pytest


@pytest.fixture()
def client():
    with mock.patch("websocket.WebSocketApp") as ws_app:
        from whisperlive_tpu.client.client import Client

        c = Client("localhost", 9090, lang="en", model="tiny",
                    log_transcription=False)
        c._ws_app_cls = ws_app
        yield c
        c._closing = True


def test_handshake_payload(client):
    client.on_open(client.client_socket)
    payload = json.loads(client.client_socket.send.call_args[0][0])
    assert payload["uid"] == client.uid
    assert payload["language"] == "en"
    assert payload["task"] == "transcribe"
    assert payload["model"] == "tiny"
    assert "use_vad" in payload and "same_output_threshold" in payload


def test_server_ready_flips_recording(client):
    msg = json.dumps({"uid": client.uid, "message": "SERVER_READY", "backend": "tpu"})
    client.on_message(None, msg)
    assert client.recording is True
    assert client.server_backend == "tpu"


def test_wrong_uid_ignored(client):
    msg = json.dumps({"uid": "other", "message": "SERVER_READY"})
    client.on_message(None, msg)
    assert client.recording is False


def test_segments_accumulate_and_dedup(client):
    client.server_backend = "tpu"
    seg = {"start": "0.000", "end": "1.000", "text": " a", "completed": True}
    partial = {"start": "1.000", "end": "1.500", "text": " b", "completed": False}
    msg = json.dumps({"uid": client.uid, "segments": [seg, partial]})
    client.on_message(None, msg)
    client.on_message(None, msg)  # duplicate delivery
    assert client.transcript == [seg]
    assert client.last_segment == partial


def test_language_detection_message(client):
    msg = json.dumps({"uid": client.uid, "language": "de", "language_prob": 0.9})
    client.on_message(None, msg)
    assert client.language == "de"


def test_translation_callback():
    with mock.patch("websocket.WebSocketApp"):
        from whisperlive_tpu.client.client import Client

        got = []
        c = Client("localhost", 9090, log_transcription=False,
                    translation_callback=got.append)
        seg = {"start": "0.000", "end": "1.000", "text": "bonjour", "completed": True}
        c.on_message(None, json.dumps({"uid": c.uid, "translated_segments": [seg]}))
        assert got == [[seg]]
        assert c.translated_transcript == [seg]
        c._closing = True


def test_disconnect_message_stops_recording(client):
    client.recording = True
    client._closing = True  # avoid reconnect timer in tests
    client.on_message(None, json.dumps({"uid": client.uid, "message": "DISCONNECT"}))
    assert client.recording is False


def test_status_error_sets_flag(client):
    client.on_message(None, json.dumps(
        {"uid": client.uid, "status": "ERROR", "message": "boom"}))
    assert client.server_error is True


def test_reconnect_on_unexpected_drop():
    with mock.patch("websocket.WebSocketApp"):
        from whisperlive_tpu.client.client import Client

        c = Client("localhost", 9090, log_transcription=False,
                    max_retries=2, retry_delay=0.05)
        c.recording = True
        with mock.patch.object(c, "_connect") as reconnect:
            c.on_close(None, 1006, "abnormal")
            time.sleep(0.2)
            assert reconnect.called
            assert c._retries_left == 1
        c._closing = True


def test_no_reconnect_after_server_error():
    with mock.patch("websocket.WebSocketApp"):
        from whisperlive_tpu.client.client import Client

        c = Client("localhost", 9090, log_transcription=False,
                    max_retries=2, retry_delay=0.05)
        c.recording = True
        c.server_error = True
        with mock.patch.object(c, "_connect") as reconnect:
            c.on_close(None, 1006, "abnormal")
            time.sleep(0.2)
            assert not reconnect.called
        c._closing = True


def test_no_reconnect_after_clean_close():
    with mock.patch("websocket.WebSocketApp"):
        from whisperlive_tpu.client.client import Client

        c = Client("localhost", 9090, log_transcription=False, max_retries=2)
        c.recording = True
        with mock.patch.object(c, "_connect") as reconnect:
            c.close_websocket()
            c.on_close(None, 1000, "bye")
            time.sleep(0.1)
            assert not reconnect.called


def test_write_srt(tmp_path, client):
    client.server_backend = "tpu"
    client.transcript = [
        {"start": "0.000", "end": "1.000", "text": " hi", "completed": True}
    ]
    client.last_segment = {"start": "1.000", "end": "2.000", "text": " there",
                           "completed": False}
    path = str(tmp_path / "out.srt")
    client.write_srt_file(path)
    content = open(path).read()
    assert "hi" in content and "there" in content and "-->" in content


def _tee(n=2):
    from whisperlive_tpu.client.client import Client, TranscriptionTeeClient

    with mock.patch("websocket.WebSocketApp"):
        clients = [Client("localhost", 9090, log_transcription=False) for _ in range(n)]
        for c in clients:
            c.send_packet_to_server = mock.MagicMock()
            c._closing = True
        tee = TranscriptionTeeClient(clients)
        return tee, clients


def test_tee_multicast_conditional_on_recording():
    tee, clients = _tee()
    clients[0].recording = True
    clients[1].recording = False
    tee.multicast_packet(b"pcm")
    clients[0].send_packet_to_server.assert_called_once_with(b"pcm")
    clients[1].send_packet_to_server.assert_not_called()


def test_tee_multicast_unconditional():
    tee, clients = _tee()
    for c in clients:
        c.recording = False
    tee.multicast_packet(b"END_OF_AUDIO", unconditional=True)
    for c in clients:
        c.send_packet_to_server.assert_called_once()


def test_tee_requires_clients():
    from whisperlive_tpu.client.client import TranscriptionTeeClient

    with pytest.raises(Exception):
        TranscriptionTeeClient([])


def test_tee_srt_paths_per_client(tmp_path):
    tee, clients = _tee(2)
    for i, c in enumerate(clients):
        c.server_backend = "tpu"
        c.srt_file_path = str(tmp_path / "out.srt")
        c.transcript = [{"start": "0.000", "end": "1.000",
                         "text": f"c{i}", "completed": True}]
        c.last_segment = None
    tee.write_all_clients_srt()
    assert (tmp_path / "out_0.srt").exists()
    assert (tmp_path / "out_1.srt").exists()
    assert "c0" in (tmp_path / "out_0.srt").read_text()
    assert "c1" in (tmp_path / "out_1.srt").read_text()


def test_print_transcript_timestamps_mode(capsys):
    """--timestamps rendering: '[start -> end] text' with wrapped
    continuation lines indented under the text column (utils.py:15-35)."""
    from whisperlive_tpu.utils.text import print_transcript

    segs = [
        {"start": "0.000", "end": "2.500", "text": "hello there"},
        {"start": "2.500", "end": "5.000", "text": "x " * 60},
    ]
    print_transcript(segs, timestamps=True, max_lines=10)
    out = capsys.readouterr().out
    lines = out.splitlines()
    assert lines[0].startswith("[0.000 -> 2.500] hello there")
    assert any(line.startswith("[2.500 -> 5.000] ") for line in lines)
    # wrapped continuations are indented
    cont = [l for l in lines if l.startswith(" " * 10)]
    assert cont, "long text should wrap with indent"


def test_client_timestamps_display(capsys):
    """Client with enable_timestamps renders segment boundaries."""
    with mock.patch("websocket.WebSocketApp"):
        from whisperlive_tpu.client.client import Client

        c = Client("localhost", 9090, lang="en", enable_timestamps=True,
                   n_display_segments=5)
        c.process_segments([
            {"start": "0.000", "end": "1.000", "text": "one", "completed": True},
            {"start": "1.000", "end": "2.000", "text": "two", "completed": False},
        ])
        out = capsys.readouterr().out
        assert "[0.000 -> 1.000] one" in out
        assert "[1.000 -> 2.000] two" in out
