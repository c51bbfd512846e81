"""The one-command WER parity harness (scripts/eval_wer.py).

Two layers:
  * a hermetic smoke test — FakeBackend through the REAL server+client
    loop proves the harness plumbing (wire, SRT, normalization, scoring)
    end to end without weights;
  * the real parity run — executed only when WL_WER_CKPT points at a
    converted checkpoint (zero-egress environments have none), mirroring
    /root/reference/tests/test_server.py:73-118's WER < 0.05 assertion.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from eval_wer import JFK_GROUND_TRUTH, run_eval  # noqa: E402


def _fake_wav(tmp_path, seconds=4.0):
    import numpy as np

    from whisperlive_tpu.audio.io import write_wav

    path = tmp_path / "eval.wav"
    audio = (
        0.1 * np.sin(2 * np.pi * 300 * np.arange(int(16000 * seconds)) / 16000)
    ).astype(np.float32)
    write_wav(str(path), audio)
    return str(path)


def test_harness_smoke_fake_backend(tmp_path):
    """FakeBackend emits ' wordN' per second; the harness must carry that
    through server -> client -> normalization -> WER scoring."""
    from whisperlive_tpu.serving.backends import FakeBackend

    wav = _fake_wav(tmp_path)
    srt = str(tmp_path / "out.srt")
    result = run_eval(
        audio=wav,
        ref_text="word0 word1 word2",
        backend=FakeBackend(),
        use_vad=False,
        out_srt=srt,
    )
    assert result["ref_words"] == 3
    assert 0.0 <= result["wer"] <= 1.0
    # the hypothesis really came over the wire
    assert "word" in result["hypothesis"]
    assert os.path.exists(srt)


def test_harness_scoring_math(tmp_path):
    """A hypothesis equal to the reference scores WER 0 and passes."""
    from whisperlive_tpu.serving.backends import FakeBackend

    class ExactBackend(FakeBackend):
        async def transcribe(self, chunk, options, **kw):
            result = await super().transcribe(chunk, options, **kw)
            # distinct texts: the client's rolling-partial dedup collapses
            # identical adjacent segments (reference client.py:174-190)
            for s in result.segments:
                s.text = f" exact{int(s.start)}"
            return result

    wav = _fake_wav(tmp_path, seconds=2.0)
    result = run_eval(
        audio=wav,
        ref_text="exact0 exact1",
        backend=ExactBackend(),
        use_vad=False,
        out_srt=str(tmp_path / "exact.srt"),
    )
    assert result["wer"] == 0.0 and result["pass"]


@pytest.mark.skipif(
    not os.environ.get("WL_WER_CKPT"),
    reason="needs pretrained weights: set WL_WER_CKPT=<converted ckpt dir>",
)
def test_jfk_wer_parity_real_weights():
    """The reference's anchor assertion, verbatim: jfk.flac through a real
    server+client must score WER < 0.05 (test_server.py:100-101)."""
    result = run_eval(
        audio=os.environ.get(
            "WL_WER_AUDIO", "/root/reference/assets/jfk.flac"
        ),
        ref_text=JFK_GROUND_TRUTH,
        model=os.environ.get("WL_WER_MODEL", "base.en"),
        ckpt=os.environ["WL_WER_CKPT"],
    )
    assert result["pass"], result
