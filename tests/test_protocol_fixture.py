"""The shared wire-protocol fixture (clients/protocol_fixture.json) keeps
the Python client/server and the browser-extension JS agreeing on message
shapes: the extension's jest suite validates its handshake and segment
handling against the SAME file these tests validate the Python side
against — neither can drift alone."""

import json
import os
from unittest import mock

import numpy as np
import pytest

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "clients", "protocol_fixture.json"
)


@pytest.fixture(scope="module")
def protocol():
    with open(FIXTURE) as f:
        return json.load(f)


def _client_handshake():
    from whisperlive_tpu.client.client import Client

    sent = []
    with mock.patch("websocket.WebSocketApp"), mock.patch("threading.Thread"):
        c = Client(host="h", port=1, lang="en")
    ws = mock.MagicMock()
    ws.send = lambda payload, *a: sent.append(payload)
    c.on_open(ws)
    return json.loads(sent[0])


def test_python_client_handshake_matches_fixture(protocol):
    handshake = _client_handshake()
    for key in protocol["handshake_required"]:
        assert key in handshake, f"missing required handshake key {key}"
    allowed = set(
        protocol["handshake_required"] + protocol["handshake_optional"]
    )
    unknown = set(handshake) - allowed
    assert not unknown, f"handshake keys not in fixture: {unknown}"
    assert handshake["task"] in protocol["task_values"]


def test_segment_format_matches_fixture(protocol):
    from whisperlive_tpu.serving.session import format_segment

    seg = format_segment(0.0, 1.23, " hello world", completed=False)
    for key in protocol["segment_required_keys"]:
        assert key in seg
    allowed = set(
        protocol["segment_required_keys"] + protocol["segment_optional_keys"]
    )
    assert set(seg) <= allowed
    # "%.3f"-formatted second strings — the byte-compat detail clients key on
    assert seg["start"] == "0.000"
    assert seg["end"] == "1.230"
    example = protocol["example_segment"]
    assert set(example) <= allowed
    assert example["start"] == "%.3f" % float(example["start"])


def test_wire_constants_match_fixture(protocol):
    assert protocol["end_of_audio"] == "END_OF_AUDIO"
    assert protocol["server_ready_message"] == "SERVER_READY"
    assert protocol["disconnect_message"] == "DISCONNECT"
    assert set(protocol["server_status_values"]) == {"WAIT", "ERROR", "WARNING"}
    assert protocol["pcm"]["sample_rate"] == 16000


def test_server_uses_fixture_status_values(protocol):
    """The server's WAIT/READY/DISCONNECT literals must appear verbatim in
    the source the fixture describes (grep-level guard against renames)."""
    src_dir = os.path.join(
        os.path.dirname(__file__), "..", "whisperlive_tpu", "serving"
    )
    blob = ""
    for name in ("server.py", "session.py"):
        with open(os.path.join(src_dir, name)) as f:
            blob += f.read()
    assert '"WAIT"' in blob
    assert protocol["server_ready_message"] in blob
    assert protocol["disconnect_message"] in blob
    assert protocol["end_of_audio"] in blob
