"""SRT/VTT formatting and terminal rendering (reference test_utils.py)."""

import io
from contextlib import redirect_stdout

from whisperlive_tpu.utils import text as t


def test_format_time():
    assert t.format_time(0.0) == "00:00:00,000"
    assert t.format_time(3661.5) == "01:01:01,500"
    assert t.format_time(59.9994) == "00:00:59,999"
    assert t.format_time(1.5, vtt=True) == "00:00:01.500"


def test_srt_output():
    segs = [
        {"start": "0.000", "end": "1.500", "text": " hello "},
        {"start": "1.500", "end": "3.000", "text": "world"},
    ]
    srt = t.segments_to_srt(segs)
    lines = srt.splitlines()
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:01,500"
    assert lines[2] == "hello"
    assert "2" in lines and "world" in srt


def test_vtt_output():
    segs = [{"start": 0.0, "end": 1.0, "text": "hi"}]
    vtt = t.segments_to_vtt(segs)
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.000" in vtt


def test_create_srt_file(tmp_path):
    path = tmp_path / "o.srt"
    t.create_srt_file([{"start": 0, "end": 1, "text": "x"}], str(path))
    assert "-->" in path.read_text()


def test_print_transcript_wraps(monkeypatch):
    import os

    monkeypatch.setattr(os, "get_terminal_size", lambda: os.terminal_size((30, 20)))
    buf = io.StringIO()
    with redirect_stdout(buf):
        t.print_transcript(["word " * 20], max_lines=3)
    out = buf.getvalue().splitlines()
    assert len(out) == 3
    assert all(len(line) <= 30 for line in out)
