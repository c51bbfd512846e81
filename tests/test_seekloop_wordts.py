"""Word-timestamp seek adjustments + hallucination_silence_threshold
re-seek in the offline loop (generate_segments), on synthetic timing
fixtures with a scripted engine — reference semantics from
transcriber_faster_whisper.py:1225-1290.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from whisperlive_tpu.engine.align import WordTiming
from whisperlive_tpu.engine.engine import DecodeResult, TranscribeOptions
from whisperlive_tpu.engine.transcribe import generate_segments

TB = 50_000  # timestamp_begin
EOT = 49_000


def ts(sec: float) -> int:
    return TB + int(round(sec / 0.02))


class _Spec:
    timestamp_begin = TB
    eot = EOT
    multilingual = False


class _Tok:
    spec = _Spec()

    def decode(self, toks):
        return " " + " ".join(f"w{t}" for t in toks if t < EOT)

    def encode(self, text):
        return [1, 2]


class FakeEngine:
    """Scripted decode results + word alignments per window."""

    def __init__(self, decodes, alignments=None):
        self.spec = _Spec()
        self.tokenizer = _Tok()
        self.cfg = SimpleNamespace(n_mels=80)
        self.decodes = list(decodes)
        self.alignments = list(alignments or [])
        self.seeks_seen = []

    def prepare_mel(self, mel):
        return None, "cross"

    def build_prompt(self, options, previous_tokens=(), language=None,
                     context_preseeded=False):
        return [100, 101, 102], 0

    def decode_with_fallback(self, cross, prompts, sots, options, seed=0):
        return [self.decodes.pop(0)]

    def align_words(self, cross, idx, tokens, num_frames, merge=True,
                    language=None, task="transcribe"):
        return self.alignments.pop(0)


def _res(tokens):
    return DecodeResult(
        tokens=np.asarray(tokens, np.int64), avg_logprob=-0.1,
        no_speech_prob=0.0, compression_ratio=1.0, temperature=0.0,
    )


def _features(seconds):
    return np.zeros((int(seconds * 100) + 1, 80), np.float32)


OPTS = TranscribeOptions(
    language="en", temperatures=(0.0,), log_prob_threshold=None,
    no_speech_threshold=None, compression_ratio_threshold=None,
)


def test_word_seek_adjustment_rewinds_to_last_word_end():
    """Without a single-timestamp ending, seek snaps to the last aligned
    word's end (transcriber_faster_whisper.py:1235-1239)."""
    # window 1: one closed segment [0, 8] then unfinished tail -> rewind;
    # aligned words end at 6.0 s, so seek goes to 600 frames, not 800
    w1 = _res([ts(0.0), 5, ts(8.0), ts(8.0), 6, 7])
    w2 = _res([ts(0.0), 9, ts(4.0), ts(4.0)])  # second window
    align1 = [
        WordTiming(word=" a", tokens=[5], start=5.4, end=6.0, probability=0.9),
    ]
    align2 = [
        WordTiming(word=" b", tokens=[9], start=2.4, end=3.0, probability=0.9),
    ]
    eng = FakeEngine([w1, w2], [align1, align2])
    opts = TranscribeOptions(**{**OPTS.__dict__, "word_timestamps": True})
    segments, _, _, _ = generate_segments(eng, _features(9.0), opts)
    # the second window starts at the adjusted seek: 6.0 s, not 8.0 s
    assert segments[0].words[0].end == pytest.approx(6.0)
    assert segments[1].seek == 600
    # segment start snapped to its first word (add_word_timestamps boundary)
    assert segments[1].start == pytest.approx(8.4)


def test_hallucination_skip_leading_silence():
    """An anomalous FIRST segment after a silence gap > threshold makes the
    loop re-seek past the gap without emitting anything
    (transcriber_faster_whisper.py:1244-1251)."""
    # window 1 at seek 0: an anomalous segment starting at 4 s (gap 4 > 2)
    bad_words = [
        WordTiming(word=" x", tokens=[5], start=4.0, end=4.05, probability=0.01),
        WordTiming(word=" y", tokens=[6], start=4.05, end=4.1, probability=0.01),
    ]
    w1 = _res([ts(4.0), 5, 6, ts(5.0), ts(5.0), 7, ts(6.0)])
    # after the re-seek (to 0 + 4 s = 400 frames) the next window is clean
    w2 = _res([ts(0.0), 9, ts(3.0), ts(3.0)])
    good_words = [
        WordTiming(word=" ok", tokens=[9], start=0.5, end=2.5, probability=0.9),
    ]
    eng = FakeEngine([w1, w2], [bad_words, good_words])
    opts = TranscribeOptions(**{
        **OPTS.__dict__, "word_timestamps": True,
        "hallucination_silence_threshold": 2.0,
    })
    segments, _, _, _ = generate_segments(eng, _features(6.5), opts)
    texts = [s.text for s in segments]
    assert all("w5" not in t and "w6" not in t for t in texts), texts
    # the surviving segment came from the re-seeked window at 4 s
    assert segments and segments[0].seek == 400


def test_hallucination_surrounded_by_silence_truncates_window():
    """An anomalous segment surrounded by silence drops itself and later
    pieces of the window; seek moves to its start
    (transcriber_faster_whisper.py:1253-1283)."""
    # window: good segment [0,2], anomalous [10,10.4] (silence both sides),
    # then another piece after it that must be dropped too
    w1 = _res([
        ts(0.0), 5, ts(2.0),             # good
        ts(2.0), ts(10.0),               # (pair boundary)
        6, ts(10.4), ts(10.4), 7, ts(12.0),
    ])
    words = [
        WordTiming(word=" good", tokens=[5], start=0.2, end=1.8, probability=0.9),
        WordTiming(word=" bad", tokens=[6], start=10.0, end=10.05, probability=0.01),
        WordTiming(word=" bad2", tokens=[7], start=10.4, end=10.45, probability=0.01),
    ]
    w2 = _res([ts(0.0), 9, ts(2.0)])  # single-timestamp ending: clean
    words2 = [
        WordTiming(word=" z", tokens=[9], start=0.1, end=1.5, probability=0.9),
    ]
    eng = FakeEngine([w1, w2], [words, words2])
    opts = TranscribeOptions(**{
        **OPTS.__dict__, "word_timestamps": True,
        "hallucination_silence_threshold": 2.0,
    })
    segments, _, _, _ = generate_segments(eng, _features(15.0), opts)
    texts = [s.text for s in segments]
    assert any("w5" in t for t in texts)
    assert all("w6" not in t and "w7" not in t for t in texts), texts
    # seek jumped to the anomaly's start (~10 s -> 1000 frames)
    assert segments[1].seek == 1000


def test_clip_timestamps_restricts_decoding():
    """clip_timestamps seeks only inside the given ranges
    (transcriber_faster_whisper.py:1060-1079)."""
    w1 = _res([ts(0.0), 5, ts(4.0)])  # lone trailing ts: window consumed
    eng = FakeEngine([w1])
    opts = TranscribeOptions(**{**OPTS.__dict__, "clip_timestamps": "2,6"})
    segments, _, _, _ = generate_segments(eng, _features(30.0), opts)
    assert len(eng.decodes) == 0  # exactly one window decoded
    assert segments[0].seek == 200  # clip start
    assert segments[0].start == pytest.approx(2.0)
    assert segments[0].end == pytest.approx(6.0)
