"""DTW word alignment: path properties + engine integration on tiny model."""

import numpy as np
import pytest

from whisperlive_tpu.engine import align as align_mod


def test_dtw_identity_diagonal():
    n = 6
    cost = np.ones((n, n)) - np.eye(n)  # cheapest along the diagonal
    ti, fi = align_mod.dtw_path(cost)
    # path is monotone and covers both axes
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)
    # identity matrix: path should ride the diagonal
    diag = [f for t, f in zip(ti, fi) if t == f]
    assert len(diag) >= n


def test_dtw_rectangular():
    cost = np.random.default_rng(0).random((4, 10))
    ti, fi = align_mod.dtw_path(cost)
    assert ti[-1] == 3 and fi[-1] == 9
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)


def test_merge_punctuations():
    W = align_mod.WordTiming
    words = [
        W(" hello", [1], 0.0, 0.5, 0.9),
        W(",", [2], 0.5, 0.6, 0.9),
        W(" world", [3], 0.6, 1.0, 0.9),
    ]
    merged = align_mod.merge_punctuations(words)
    assert [w.word for w in merged] == [" hello,", " world"]
    assert merged[0].end == 0.6


def test_words_for_segment_clipping():
    W = align_mod.WordTiming
    timings = [W(" a", [1], 0.0, 1.0, 0.5), W(" b", [2], 1.5, 2.5, 0.5)]
    words = align_mod.words_for_segment(timings, 1.2, 3.0)
    assert len(words) == 1 and words[0].word == " b"
    assert words[0].start == 1.5


@pytest.fixture(scope="module")
def tiny_engine():
    import jax.numpy as jnp

    from whisperlive_tpu.engine.engine import WhisperEngine
    from whisperlive_tpu.models.whisper import WhisperConfig, init_params

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=100, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=48, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, seed=0)
    return WhisperEngine(
        cfg, params, compute_dtype=jnp.float32,
        batch_buckets=(1, 2), prompt_buckets=(16, 48),
    )


def test_engine_align_words_shapes(tiny_engine, rng):
    import jax.numpy as jnp

    eng = tiny_engine
    mel = rng.standard_normal((1, 2 * eng.cfg.n_audio_ctx, 80)).astype(np.float32)
    _, cross = eng.prepare_mel(jnp.asarray(mel))
    text = eng.tokenizer.encode(" hello world how are you")
    timings = eng.align_words(cross, 0, text, num_frames=2 * eng.cfg.n_audio_ctx)
    assert timings, "no word timings returned"
    for w in timings:
        assert 0.0 <= w.start <= w.end
        assert 0.0 <= w.probability <= 1.0
    # words reconstruct the text
    assert "".join(w.word for w in timings).strip().startswith("hello")


def test_word_anomaly_score():
    W = align_mod.WordTiming
    good = W(" hello", [1], 0.0, 0.4, 0.9)
    assert align_mod.word_anomaly_score(good) == 0.0
    low_prob = W(" x", [1], 0.0, 0.4, 0.05)
    assert align_mod.word_anomaly_score(low_prob) >= 1.0
    too_short = W(" x", [1], 0.0, 0.01, 0.9)
    assert align_mod.word_anomaly_score(too_short) > 1.0
    too_long = W(" xxxx", [1], 0.0, 4.0, 0.9)
    assert align_mod.word_anomaly_score(too_long) == pytest.approx(2.0)


def test_is_segment_anomaly():
    W = align_mod.WordTiming
    good = [W(f" w{i}", [i], i * 0.3, i * 0.3 + 0.25, 0.9) for i in range(6)]
    assert align_mod.is_segment_anomaly(good) is False
    bad = [W(f" w{i}", [i], 0.0, 0.01, 0.05) for i in range(6)]
    assert align_mod.is_segment_anomaly(bad) is True
    assert align_mod.is_segment_anomaly([]) is False
    # punctuation-only words don't count
    punct = [W(".", [1], 0.0, 0.01, 0.01)]
    assert align_mod.is_segment_anomaly(punct) is False


def test_engine_align_single_word(tiny_engine, rng):
    """Single-word alignment must not crash (empty cumsum dtype trap)."""
    import jax.numpy as jnp

    eng = tiny_engine
    mel = rng.standard_normal((1, 2 * eng.cfg.n_audio_ctx, 80)).astype(np.float32)
    _, cross = eng.prepare_mel(jnp.asarray(mel))
    timings = eng.align_words(
        cross, 0, eng.tokenizer.encode(" hi"), num_frames=2 * eng.cfg.n_audio_ctx
    )
    assert len(timings) == 1
    assert timings[0].word == " hi"


def test_merge_punctuations_custom_sets():
    """prepend/append_punctuations are per-request options (reference
    transcribe() args): symbols outside the configured sets must stay
    separate words, and custom symbols must merge."""
    W = align_mod.WordTiming

    def mk():
        return [
            W(" ~", [1], 0.0, 0.2, 0.9),
            W(" hi", [2], 0.2, 0.5, 0.9),
            W(",", [3], 0.5, 0.6, 0.9),
        ]

    # default sets: "~" is not prepend punctuation -> stays; "," merges
    merged = align_mod.merge_punctuations(mk())
    assert [w.word for w in merged] == [" ~", " hi,"]
    # custom prepend including "~", empty append: "~" merges, "," stays
    merged = align_mod.merge_punctuations(mk(), prepend="~", append="")
    assert [w.word for w in merged] == [" ~ hi", ","]
