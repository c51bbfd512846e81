"""Prometheus metrics: every track_* touches the right collector and all
calls are safe no-ops without prometheus (mirrors reference test_metrics.py)."""

import pytest

from whisperlive_tpu.utils import metrics as m


pytestmark = pytest.mark.skipif(
    not m.metrics_available(), reason="prometheus_client not installed"
)


def _counter_value(c, **labels):
    if labels:
        c = c.labels(**labels)
    return c._value.get()


def test_connection_counters():
    before_total = _counter_value(m.CONNECTIONS_TOTAL)
    before_active = m.CONNECTIONS_ACTIVE._value.get()
    m.track_connection_accepted()
    assert _counter_value(m.CONNECTIONS_TOTAL) == before_total + 1
    assert m.CONNECTIONS_ACTIVE._value.get() == before_active + 1
    m.track_connection_closed()
    assert m.CONNECTIONS_ACTIVE._value.get() == before_active
    before_rej = _counter_value(m.CONNECTIONS_REJECTED)
    m.track_connection_rejected()
    assert _counter_value(m.CONNECTIONS_REJECTED) == before_rej + 1


def test_latency_histogram_observes():
    before = m.TRANSCRIPTION_LATENCY._sum.get()
    m.track_transcription_latency(0.25)
    assert m.TRANSCRIPTION_LATENCY._sum.get() == pytest.approx(before + 0.25)


def test_audio_seconds_and_segments():
    before = _counter_value(m.AUDIO_SECONDS)
    m.track_audio_seconds(3.5)
    assert _counter_value(m.AUDIO_SECONDS) == pytest.approx(before + 3.5)
    m.track_audio_seconds(-1.0)  # negative clamped
    assert _counter_value(m.AUDIO_SECONDS) == pytest.approx(before + 3.5)
    before_seg = _counter_value(m.SEGMENTS_EMITTED, completed="true")
    m.track_segments(3, completed=True)
    assert _counter_value(m.SEGMENTS_EMITTED, completed="true") == before_seg + 3


def test_rest_and_errors():
    before = _counter_value(m.REST_REQUESTS, endpoint="/x", status="200")
    m.track_rest_request("/x", 200)
    assert _counter_value(m.REST_REQUESTS, endpoint="/x", status="200") == before + 1
    before_err = _counter_value(m.ERRORS, type="boom")
    m.track_error("boom")
    assert _counter_value(m.ERRORS, type="boom") == before_err + 1


def test_gauges():
    m.set_active_streams(7)
    assert m.ACTIVE_STREAMS._value.get() == 7
    m.track_batch_occupancy(4)  # histogram accepts without error
