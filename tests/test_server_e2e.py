"""End-to-end server+client over real websockets (fake model).

The asyncio analogue of the reference's test_server.py integration test:
a real TranscriptionServer on a real port, the real client library
streaming real PCM, asserting the full wire protocol — with the
deterministic FakeBackend standing in for the model (the reference's
hermetic seam, SURVEY §4)."""

import asyncio
import socket
import threading
import time

import numpy as np
import pytest

from whisperlive_tpu.serving.backends import FakeBackend
from whisperlive_tpu.serving.server import TranscriptionServer


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class ServerHarness:
    def __init__(self, max_clients=4, api_key=None, max_connection_time=600,
                 backend=None, backend_name="fake"):
        self.port = _free_port()
        self.max_clients = max_clients
        self.api_key = api_key
        self.max_connection_time = max_connection_time
        self.backend = backend if backend is not None else FakeBackend()
        self.backend_name = backend_name
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._loop = None

    def _run(self):
        self.server = TranscriptionServer()
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        try:
            self._loop.run_until_complete(
                self.server.serve(
                    self.backend,
                    host="127.0.0.1",
                    port=self.port,
                    backend_name=self.backend_name,
                    max_clients=self.max_clients,
                    max_connection_time=self.max_connection_time,
                    api_key=self.api_key,
                )
            )
        except Exception:
            pass
        finally:
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
        raise RuntimeError("server did not start")

    def __exit__(self, *exc):
        if self._loop is not None and not self._loop.is_closed():
            self._loop.call_soon_threadsafe(self.server.request_shutdown)
        self._thread.join(timeout=10)
        return False


@pytest.fixture()
def server():
    with ServerHarness() as h:
        yield h


def test_streaming_client_end_to_end(server):
    from whisperlive_tpu.client import StreamingTranscriptionClient

    committed, partials = [], []
    client = StreamingTranscriptionClient(
        "127.0.0.1",
        server.port,
        lang="en",
        on_committed=committed.append,
        on_partial=partials.append,
        use_vad=False,
        same_output_threshold=2,
    )
    audio = (0.1 * np.sin(2 * np.pi * 300 * np.arange(16000 * 4) / 16000)).astype(
        np.float32
    )
    for off in range(0, len(audio), 8000):
        client.send_array(audio[off : off + 8000])
        time.sleep(0.05)
    deadline = time.time() + 15
    while not committed and time.time() < deadline:
        time.sleep(0.1)
    client.close(wait_for_server=False)
    assert committed, "no committed segments received"
    seg = committed[0]
    assert set(seg) >= {"start", "end", "text", "completed"}
    assert seg["completed"] is True
    assert "." in seg["start"]  # ms-precision string format
    assert seg["text"].strip().startswith("word")


def test_server_full_sends_wait(server):
    from whisperlive_tpu.client import Client, StreamingTranscriptionClient

    clients = [
        StreamingTranscriptionClient("127.0.0.1", server.port, use_vad=False)
        for _ in range(4)
    ]
    # 5th client must get a WAIT status
    extra = Client("127.0.0.1", server.port, log_transcription=False)
    deadline = time.time() + 10
    while not extra.waiting and time.time() < deadline:
        time.sleep(0.05)
    assert extra.waiting
    extra.close_websocket()
    for c in clients:
        c.close(wait_for_server=False)


def test_api_key_auth():
    from whisperlive_tpu.client import StreamingTranscriptionClient

    with ServerHarness(api_key="sekret") as h:
        # wrong key: connection is closed before SERVER_READY
        with pytest.raises((ConnectionError, TimeoutError)):
            StreamingTranscriptionClient(
                "127.0.0.1", h.port, connect_timeout=3, use_vad=False
            )
        # correct key via query token
        ok = StreamingTranscriptionClient(
            "127.0.0.1", h.port, connect_timeout=10, use_vad=False, api_key="sekret"
        )
        ok.close(wait_for_server=False)


def test_transcription_client_file(tmp_path, server):
    from whisperlive_tpu.audio.io import write_wav
    from whisperlive_tpu.client import TranscriptionClient

    wav = tmp_path / "t.wav"
    audio = (0.05 * np.random.default_rng(0).standard_normal(16000 * 3)).astype(
        np.float32
    )
    write_wav(str(wav), audio)
    srt = tmp_path / "out.srt"
    client = TranscriptionClient(
        "127.0.0.1",
        server.port,
        lang="en",
        use_vad=False,
        same_output_threshold=2,
        srt_file_path=str(srt),
        log_transcription=False,
    )
    client.client.disconnect_if_no_response_for = 2
    text = client(str(wav))
    assert "word" in text
    assert srt.exists()
    content = srt.read_text()
    assert "-->" in content and "word" in content


def test_connection_time_eviction():
    """Clients past max_connection_time get DISCONNECT and are dropped
    (server.py:141-158 behavior)."""

    with ServerHarness(max_connection_time=3) as h:
        from whisperlive_tpu.client import Client

        c = Client("127.0.0.1", h.port, log_transcription=False)
        deadline = time.time() + 10
        while not c.recording and time.time() < deadline:
            time.sleep(0.05)
        assert c.recording
        # stream a little audio, then wait past the limit
        c.send_packet_to_server(np.zeros(8000, np.float32).tobytes())
        deadline = time.time() + 15
        while c.recording and time.time() < deadline:
            time.sleep(0.2)
        assert not c.recording  # DISCONNECT flipped recording off
        c.close_websocket()


def test_model_mismatch_warning():
    """Requesting a different model than served yields a WARNING status."""
    with ServerHarness() as h:
        h.server.backend.model_name = "large-v3"  # pretend a specific model

        from whisperlive_tpu.client import Client

        warnings = []
        c = Client("127.0.0.1", h.port, model="tiny", log_transcription=False)
        orig = c.handle_status_messages

        def capture(msg):
            if msg.get("status") == "WARNING":
                warnings.append(msg["message"])
            orig(msg)

        c.handle_status_messages = capture
        deadline = time.time() + 10
        while not c.recording and time.time() < deadline:
            time.sleep(0.05)
        time.sleep(0.3)
        c.close_websocket()
        assert any("large-v3" in w for w in warnings)


def test_backend_state_released_on_disconnect():
    """Per-uid backend state (VAD instances) must be freed when the client
    leaves, or a long-lived server leaks one entry per connection."""
    released = []

    class TrackingBackend(FakeBackend):
        def release(self, uid):
            released.append(uid)

    with ServerHarness() as h:
        h.server.backend = TrackingBackend()
        from whisperlive_tpu.client import StreamingTranscriptionClient

        c = StreamingTranscriptionClient("127.0.0.1", h.port, use_vad=False)
        uid = c.client.uid
        c.close(wait_for_server=False)
        deadline = time.time() + 10
        while uid not in released and time.time() < deadline:
            time.sleep(0.1)
        assert uid in released


def test_vad_gated_session_does_not_starve_event_loop():
    """Regression: backend.transcribe returning None SYNCHRONOUSLY (the
    VAD-silence gate) must not let speech_to_text spin without yielding —
    that seizes the event loop and starves every other connection."""
    import asyncio

    import numpy as np

    from whisperlive_tpu.serving.server import ServeClient
    from whisperlive_tpu.serving.session import SessionOptions

    class SilenceBackend:
        async def transcribe(self, chunk, options, **kw):
            return None  # completes without ever awaiting

    async def drive():
        client = ServeClient(
            websocket=None, uid="starve",
            options=SessionOptions(language="en", use_vad=False),
            backend=SilenceBackend(),
            send_json=lambda payload: None,
        )
        client.add_frames(np.zeros(32000, np.float32))  # 2 s tail, forever
        client.start()
        try:
            ticks = 0
            # with the busy-spin bug this coroutine never runs and
            # wait_for times out
            async def other():
                nonlocal ticks
                for _ in range(5):
                    await asyncio.sleep(0.02)
                    ticks += 1

            await asyncio.wait_for(other(), timeout=5)
            assert ticks == 5
        finally:
            await client.cleanup()

    asyncio.run(drive())


def test_cadence_spacing_policy():
    """Adaptive cadence: spacing engages only under sustained pool
    saturation, scales with the stream's round-trip EMA, and can be
    disabled (WL_ADAPTIVE_CADENCE=0)."""
    from whisperlive_tpu.serving.backends import TpuBackend

    class StubContinuous:
        beam_width = 1

        def __init__(self, load):
            self._load = load

        def load_factor(self):
            return self._load

    backend = TpuBackend(scheduler=None,
                         continuous_scheduler=StubContinuous(3.0))
    backend.cadence_alpha = 0.7
    backend._rt_ema["u1"] = 2.0
    assert backend.cadence_spacing_s("u1") == pytest.approx(1.4)
    assert backend.cadence_spacing_s("unknown-uid") == 0.0  # no history yet

    backend.continuous_scheduler._load = 1.0  # pool keeping up
    assert backend.cadence_spacing_s("u1") == 0.0

    backend.continuous_scheduler._load = 3.0
    backend.adaptive_cadence = False
    assert backend.cadence_spacing_s("u1") == 0.0

    # window-scheduler-only backends never space
    assert TpuBackend(scheduler=None).cadence_spacing_s("u1") == 0.0


def test_session_loop_honors_cadence_spacing():
    """When the backend's policy asks for spacing, the session loop holds
    the next submission (buffering audio meanwhile); with zero spacing it
    submits back-to-back."""
    import asyncio

    import numpy as np

    from whisperlive_tpu.serving.server import ServeClient
    from whisperlive_tpu.serving.session import SessionOptions

    class SpacedBackend:
        def __init__(self, spacing):
            self.spacing = spacing
            self.calls = 0

        def cadence_spacing_s(self, uid):
            return self.spacing

        async def transcribe(self, chunk, options, **kw):
            self.calls += 1
            # the real backend awaits the scheduler future; without a yield
            # here the zero-spacing loop would never cede the event loop
            await asyncio.sleep(0.01)
            from types import SimpleNamespace

            return SimpleNamespace(
                segments=[], language="en", language_prob=1.0,
                duration=len(chunk) / 16000.0, advance_s=0.0,
            )

    async def drive(spacing):
        backend = SpacedBackend(spacing)
        client = ServeClient(
            websocket=None, uid="cadence",
            options=SessionOptions(language="en", use_vad=False),
            backend=backend,
            send_json=None,
        )
        client.add_frames(np.zeros(32000, np.float32))
        client.start()
        try:
            await asyncio.sleep(1.0)
        finally:
            await client.cleanup()
        return backend.calls

    spaced = asyncio.run(drive(0.4))
    free = asyncio.run(drive(0.0))
    # 1 s / 0.4 s spacing => ~2-3 submissions; unspaced runs far more
    assert spaced <= 4, spaced
    assert free > 3 * spaced, (free, spaced)
