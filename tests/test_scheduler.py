"""Batch scheduler behavior with a mocked engine (no device work),
mirroring the reference's test_batch_inference.py strategy."""

import threading
import time
from unittest import mock

import numpy as np
import pytest

from whisperlive_tpu.engine.engine import DecodeResult, TranscribeOptions
from whisperlive_tpu.engine.scheduler import BatchRequest, BatchScheduler


class FakeEngine:
    """Engine double: records batch sizes, returns canned decode results."""

    def __init__(self):
        self.batch_buckets = (1, 2, 4, 8)
        self.prepare_calls = []
        self.decode_calls = []
        self.fail_next = False

        class _Spec:
            timestamp_begin = 50364
            eot = 50257

        self.spec = _Spec()

        class _TokSpec:
            multilingual = True

        class _Tok:
            spec = _TokSpec()

            def decode(self, toks):
                return " text" if toks else ""

        self.tokenizer = _Tok()

    def prepare(self, audio):
        self.prepare_calls.append(audio.shape)
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("device exploded")

        class _Cross:
            shape = (2, 2, audio.shape[0], 10, 2, 4)

        return None, _Cross()

    def detect_language_from_cross(self, cross):
        return [("en", 0.9)] * cross.shape[2]

    def build_prompt(self, options, previous_tokens=(), language=None):
        return [50258], 0

    def _result(self):
        return DecodeResult(
            tokens=np.array([50364, 100, 101, 50374], np.int32),
            avg_logprob=-0.2,
            no_speech_prob=0.01,
            compression_ratio=1.0,
            temperature=0.0,
        )

    def decode_with_fallback(self, cross, prompts, sots, options, seed=0):
        self.decode_calls.append(len(prompts))
        return [self._result() for _ in prompts]

    def transcribe_batch(self, audio, prompts, sots, lang_known, options, seed=0):
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("device exploded")
        self.prepare_calls.append(audio.shape)
        self.decode_calls.append(len(prompts))

        class _Cross:
            shape = (2, 2, audio.shape[0], 10, 2, 4)

        return (
            [self._result() for _ in prompts],
            [("en", 0.9)] * len(prompts),
            _Cross(),
        )


@pytest.fixture()
def sched():
    s = BatchScheduler(FakeEngine(), max_batch_size=4, batch_window_ms=30)
    s.start()
    yield s
    s.stop()


def _req(seconds=2.0, **kw):
    return BatchRequest(
        audio=np.zeros(int(seconds * 16000), np.float32),
        options=TranscribeOptions(language="en"),
        **kw,
    )


def test_single_request_roundtrip(sched):
    req = _req()
    sched.submit(req)
    result = req.future.result(timeout=10)
    assert result.language == "en"
    assert result.duration == pytest.approx(2.0)
    assert len(result.segments) == 1
    seg = result.segments[0]
    assert seg.text == " text"
    assert seg.start == pytest.approx(0.0)
    assert seg.end == pytest.approx(0.2)  # 50374 - 50364 = 10 ticks * 0.02s


def test_requests_batch_within_window(sched):
    reqs = [_req() for _ in range(4)]
    for r in reqs:
        sched.submit(r)
    for r in reqs:
        r.future.result(timeout=10)
    # all four landed in one decode call
    assert max(sched.engine.decode_calls) == 4


def test_worker_survives_engine_error(sched):
    sched.engine.fail_next = True
    bad = _req()
    sched.submit(bad)
    with pytest.raises(RuntimeError):
        bad.future.result(timeout=10)
    # next request still works — the worker thread survived
    ok = _req()
    sched.submit(ok)
    assert ok.future.result(timeout=10).language == "en"


def test_max_batch_size_respected():
    eng = FakeEngine()
    s = BatchScheduler(eng, max_batch_size=2, batch_window_ms=50)
    s.start()
    try:
        reqs = [_req() for _ in range(5)]
        for r in reqs:
            s.submit(r)
        for r in reqs:
            r.future.result(timeout=10)
        assert max(eng.decode_calls) <= 2
    finally:
        s.stop()


def test_stop_terminates_worker():
    s = BatchScheduler(FakeEngine(), max_batch_size=2)
    s.start()
    thread = s._thread
    s.stop()
    assert not thread.is_alive()


def test_language_detection_for_unpinned():
    eng = FakeEngine()
    s = BatchScheduler(eng, max_batch_size=2, batch_window_ms=20)
    s.start()
    try:
        req = BatchRequest(
            audio=np.zeros(16000, np.float32), options=TranscribeOptions()
        )
        s.submit(req)
        result = req.future.result(timeout=10)
        assert result.language == "en"
        assert result.language_prob == pytest.approx(0.9)
    finally:
        s.stop()


def test_beam_request_runs_beam_program():
    """Regression (round 5): a beam_size>1 window request must take the
    SPLIT path (prepare + decode_with_fallback -> the batched beam
    program). Before the fix, any beamed request without word_timestamps
    rode the fused detect+decode program — the SAMPLING loop, which has no
    beam expansion — and silently served greedy output at beam-quality
    billing (the hybrid-beam serving path's beamed fulls all did this)."""
    eng = FakeEngine()
    routes = []
    orig_fused = eng.transcribe_batch
    orig_split = eng.decode_with_fallback

    def fused(*a, **kw):
        routes.append("fused")
        return orig_fused(*a, **kw)

    def split(*a, **kw):
        routes.append("split")
        return orig_split(*a, **kw)

    eng.transcribe_batch = fused
    eng.decode_with_fallback = split
    s = BatchScheduler(eng, max_batch_size=2, batch_window_ms=20)
    s.start()
    try:
        req = BatchRequest(
            audio=np.zeros(16000, np.float32),
            options=TranscribeOptions(
                language="en", beam_size=5, temperatures=(0.0,),
                word_timestamps=False,
            ),
        )
        s.submit(req)
        req.future.result(timeout=10)
        assert routes == ["split"]

        # greedy requests keep the fused fast path
        req_g = BatchRequest(
            audio=np.zeros(16000, np.float32),
            options=TranscribeOptions(language="en", beam_size=1),
        )
        s.submit(req_g)
        req_g.future.result(timeout=10)
        assert routes == ["split", "fused"]
    finally:
        s.stop()


def test_beam_routing_group_key_separates_programs():
    """beam_size/patience pick the decode program and its static lane
    count — heterogeneous requests must not share a device batch."""
    a = BatchRequest(
        audio=np.zeros(16000, np.float32),
        options=TranscribeOptions(language="en", beam_size=1),
    )
    b = BatchRequest(
        audio=np.zeros(16000, np.float32),
        options=TranscribeOptions(language="en", beam_size=5),
    )
    c = BatchRequest(
        audio=np.zeros(16000, np.float32),
        options=TranscribeOptions(language="en", beam_size=5, patience=2.0),
    )
    assert a.group_key() != b.group_key()
    assert b.group_key() != c.group_key()
