"""WER scoring + error analysis (utils/wer.py) — the zero-dependency
re-expression of the reference's kaldialign-based write_error_stats
(tensorrt_utils.py:216-364). Counts are checked against hand-computed
edit distances and a brute-force O(3^n) aligner on small cases."""

import io
import itertools

import numpy as np
import pytest

from whisperlive_tpu.utils import wer as W


def brute_min_edits(ref, hyp):
    """Exponential reference: min edits over all alignments."""
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    return min(
        brute_min_edits(ref[1:], hyp[1:]) + (ref[0] != hyp[0]),
        brute_min_edits(ref[1:], hyp) + 1,
        brute_min_edits(ref, hyp[1:]) + 1,
    )


def test_align_cost_matches_bruteforce():
    rng = np.random.default_rng(0)
    vocab = list("abcd")
    for _ in range(50):
        ref = [vocab[i] for i in rng.integers(0, 4, rng.integers(0, 7))]
        hyp = [vocab[i] for i in rng.integers(0, 4, rng.integers(0, 7))]
        ali = W.align(ref, hyp)
        errs = sum(1 for r, h in ali if r != h)
        assert errs == brute_min_edits(ref, hyp), (ref, hyp)
        # the alignment reconstructs both sequences in order
        assert [r for r, _ in ali if r is not None] == ref
        assert [h for _, h in ali if h is not None] == hyp


def test_score_known_counts():
    # ref: the cat sat / hyp: the bat sat on  -> 1 sub + 1 ins over 3 words
    s = W.score([("u1", "the cat sat", "the bat sat on")])
    assert (s.substitutions, s.insertions, s.deletions, s.correct) == (1, 1, 0, 2)
    assert s.ref_words == 3
    assert s.wer == pytest.approx(2 / 3)
    assert s.sub_pairs[("cat", "bat")] == 1
    assert s.ins_words["on"] == 1


def test_score_deletion_and_empty_sides():
    s = W.score([("u", "a b c", "a c")])
    assert (s.deletions, s.correct) == (1, 2)
    assert W.score([("u", "", "x y")]).insertions == 2
    assert W.score([("u", "x y", "")]).deletions == 2
    assert W.score([("u", "", "")]).wer == 0.0


def test_normalize_text():
    assert W.normalize_text("Hello, World!  It's ME.") == [
        "hello", "world", "it's", "me"
    ]
    s = W.score([("u", "Hello, world", "hello world")], normalize=True)
    assert s.errors == 0


def test_report_surface():
    buf = io.StringIO()
    rate = W.write_error_stats(
        buf, "dev",
        [("utt0", "for the first day sir i think", "for the first day i think"),
         ("utt1", "edison illuminating", "addison illuminating")],
    )
    out = buf.getvalue()
    assert rate == pytest.approx(2 / 9)
    assert "%WER = 22.22" in out
    assert "1 insertions" not in out  # no insertions in this set
    assert "(sir->*)" in out  # deletion rendered with the gap marker
    assert "(edison->addison)" in out
    assert "PER-WORD STATS" in out and "SUBSTITUTIONS" in out


def test_adjacent_errors_merge_into_one_span():
    buf = io.StringIO()
    W.write_error_stats(buf, "m", [("u", "a x y b", "a p q b")])
    assert "(x y->p q)" in buf.getvalue()


def test_cli_roundtrip(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("the cat sat\nhello world\n")
    (tmp_path / "hyp.txt").write_text("the bat sat\nhello world\n")
    W.main([str(tmp_path / "ref.txt"), str(tmp_path / "hyp.txt")])
    out = capsys.readouterr().out
    assert "%WER = 20.00" in out
