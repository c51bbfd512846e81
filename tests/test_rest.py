"""REST endpoint over a real aiohttp server with the fake backend."""

import asyncio
import io
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from whisperlive_tpu.audio.io import write_wav
from whisperlive_tpu.serving.backends import FakeBackend
from whisperlive_tpu.serving.rest import start_rest_server


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class RestHarness:
    def __init__(self, backend=None, **kwargs):
        self.port = _free_port()
        self.backend = backend if backend is not None else FakeBackend()
        self.kwargs = kwargs
        self._loop = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        runner = self._loop.run_until_complete(
            start_rest_server(self.backend, port=self.port, host="127.0.0.1",
                              **self.kwargs)
        )
        try:
            self._loop.run_forever()
        finally:
            self._loop.run_until_complete(runner.cleanup())
            self._loop.close()

    def __enter__(self):
        self._thread.start()
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", self.port), timeout=0.2):
                    return self
            except OSError:
                time.sleep(0.05)
        raise RuntimeError("REST server did not start")

    def __exit__(self, *exc):
        if self._loop and not self._loop.is_closed():
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=10)
        return False


def _multipart(fields, files):
    boundary = "XloBoundaryX"
    body = io.BytesIO()
    for name, value in fields.items():
        body.write(f"--{boundary}\r\n".encode())
        body.write(f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode())
        body.write(f"{value}\r\n".encode())
    for name, (fname, data) in files.items():
        body.write(f"--{boundary}\r\n".encode())
        body.write(
            f'Content-Disposition: form-data; name="{name}"; filename="{fname}"\r\n'.encode()
        )
        body.write(b"Content-Type: application/octet-stream\r\n\r\n")
        body.write(data)
        body.write(b"\r\n")
    body.write(f"--{boundary}--\r\n".encode())
    return body.getvalue(), f"multipart/form-data; boundary={boundary}"


def _post(port, fields, files, headers=None):
    data, ctype = _multipart(fields, files)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/audio/transcriptions", data=data, method="POST"
    )
    req.add_header("Content-Type", ctype)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _wav_bytes(seconds=2.0, seed=0):
    import tempfile, os

    audio = (0.1 * np.random.default_rng(seed).standard_normal(int(16000 * seconds))).astype(
        np.float32
    )
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    write_wav(path, audio)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def test_rest_json_and_formats():
    with RestHarness() as h:
        wav = _wav_bytes(2.5)
        code, body = _post(h.port, {"response_format": "json"}, {"file": ("a.wav", wav)})
        assert code == 200
        assert "word0" in json.loads(body)["text"]

        code, body = _post(h.port, {"response_format": "verbose_json"}, {"file": ("a.wav", wav)})
        data = json.loads(body)
        assert code == 200 and data["segments"]
        assert data["duration"] == pytest.approx(2.5, abs=0.1)

        code, body = _post(h.port, {"response_format": "vtt"}, {"file": ("a.wav", wav)})
        assert code == 200 and body.startswith("WEBVTT")

        code, body = _post(h.port, {"response_format": "nope"}, {"file": ("a.wav", wav)})
        assert code == 400


def test_rest_auth_and_rate_limit():
    with RestHarness(api_key="k3y", rate_limit_rpm=2) as h:
        wav = _wav_bytes(1.0)
        code, _ = _post(h.port, {}, {"file": ("a.wav", wav)})
        assert code == 401
        ok = {"Authorization": "Bearer k3y"}
        assert _post(h.port, {}, {"file": ("a.wav", wav)}, ok)[0] == 200
        assert _post(h.port, {}, {"file": ("a.wav", wav)}, ok)[0] == 200
        assert _post(h.port, {}, {"file": ("a.wav", wav)}, ok)[0] == 429


def test_rest_known_speakers():
    with RestHarness() as h:
        wav = _wav_bytes(3.0)
        ref = _wav_bytes(1.0, seed=1)
        code, body = _post(
            h.port,
            {"response_format": "verbose_json", "known_speaker_names": "alice"},
            {"file": ("a.wav", wav), "known_speaker_files": ("alice.wav", ref)},
        )
        assert code == 200
        segs = json.loads(body)["segments"]
        assert segs and any("speaker" in s for s in segs)


def test_rest_word_timestamps_field():
    """verbose_json carries word timings when timestamp_granularities
    includes 'word' and the backend provides them."""
    import types

    from whisperlive_tpu.engine.scheduler import BatchResult

    class WordyBackend(FakeBackend):
        async def transcribe(self, chunk, options, **kw):
            result = await super().transcribe(chunk, options, **kw)
            if options.word_timestamps:
                for s in result.segments:
                    s.words = [
                        types.SimpleNamespace(
                            start=s.start, end=s.end, word=s.text, probability=0.9
                        )
                    ]
            return result

    with RestHarness(backend=WordyBackend()) as h:
        wav = _wav_bytes(2.0)
        code, body = _post(
            h.port,
            {"response_format": "verbose_json", "timestamp_granularities": "word"},
            {"file": ("a.wav", wav)},
        )
    assert code == 200
    segs = json.loads(body)["segments"]
    assert segs and "words" in segs[0]
    assert segs[0]["words"][0]["probability"] == 0.9


def test_transcribe_full_advances_by_seek_feedback():
    """REST file transcription follows the decode's own seek feedback
    (ADVICE r1): a window whose output ends mid-segment rewinds to the last
    closed timestamp instead of clipping at the fixed 30 s edge, and the
    per-uid backend state is released once, after the loop."""
    from types import SimpleNamespace

    from whisperlive_tpu.serving.rest import _transcribe_full
    from whisperlive_tpu.serving.session import SessionOptions
    from whisperlive_tpu.engine.scheduler import BatchResult

    calls = []
    released = []

    class SeekBackend:
        async def transcribe(self, chunk, options, *, language=None,
                             previous_tokens=(), uid="",
                             include_unfinished=True):
            calls.append((len(chunk) / 16000.0, include_unfinished))
            if len(calls) == 1:
                # 30 s window: only 20 s closed cleanly
                return BatchResult(
                    segments=[SimpleNamespace(
                        start=0.0, end=20.0, text=" first", tokens=[1],
                        avg_logprob=-0.1, no_speech_prob=0.0,
                        compression_ratio=1.0, temperature=0.0, words=None)],
                    language="en", language_prob=1.0,
                    duration=30.0, advance_s=20.0,
                )
            dur = len(chunk) / 16000.0
            return BatchResult(
                segments=[SimpleNamespace(
                    start=0.0, end=dur, text=" rest", tokens=[2],
                    avg_logprob=-0.1, no_speech_prob=0.0,
                    compression_ratio=1.0, temperature=0.0, words=None)],
                language="en", language_prob=1.0,
                duration=dur, advance_s=dur,
            )

        def release(self, uid):
            released.append(uid)

    audio = np.zeros(16000 * 40, np.float32)  # 40 s file
    segments, lang = asyncio.run(
        _transcribe_full(SeekBackend(), audio, SessionOptions(), None)
    )
    # first window consumed 20 s; second window covers the remaining 20 s
    assert [round(c[0]) for c in calls] == [30, 20]
    assert all(c[1] is False for c in calls)  # offline mode: drop unfinished
    assert [s["text"] for s in segments] == [" first", " rest"]
    assert segments[1]["start"] == pytest.approx(20.0)
    assert segments[1]["end"] == pytest.approx(40.0)
    assert len(released) == 1
