"""Speculative decoding: token-exactness vs the plain greedy loop, and
acceptance behavior with an agreeing (self) draft.

The exactness property is the whole contract: the emitted sequence depends
only on TARGET logits + the shared sampler-rule replay, never on draft
quality — a random draft must produce byte-identical output to plain
greedy decoding (engine._decode at temperature 0), just in more rounds.
"""

import numpy as np
import pytest

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.speculative import SpeculativeDecoder
from whisperlive_tpu.models.whisper import WhisperConfig, init_params

VOCAB = 51865


def _cfg(text_layers: int) -> WhisperConfig:
    return WhisperConfig(
        n_mels=80, n_vocab=VOCAB, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=text_layers,
    )


@pytest.fixture(scope="module")
def target():
    import jax.numpy as jnp

    cfg = _cfg(2)
    return WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32, batch_buckets=(1, 2)
    )


@pytest.fixture(scope="module")
def draft():
    import jax.numpy as jnp

    cfg = _cfg(1)
    return WhisperEngine(
        cfg, init_params(cfg, 7), compute_dtype=jnp.float32, batch_buckets=(1, 2)
    )


def _opts(**kw) -> TranscribeOptions:
    base = dict(
        language="en",
        temperatures=(0.0,),
        log_prob_threshold=None,
        no_speech_threshold=None,
        compression_ratio_threshold=None,
        max_new_tokens=24,
    )
    base.update(kw)
    return TranscribeOptions(**base)


def _decode_pair(target, spec, audio, options):
    enc, cross_t = target.prepare(audio)
    cross_d = spec.cross_from_enc(enc)
    prompt, sot = target.build_prompt(options, language="en")
    r_spec = spec.decode(cross_t, cross_d, prompt, sot, options)
    (r_plain,) = target.decode_batch(
        cross_t, [prompt], [sot], options, temperatures=[0.0]
    )
    return r_spec, r_plain


def test_random_draft_is_token_exact(target, draft, rng):
    """A never-agreeing draft must not change the output — only the cost."""
    spec = SpeculativeDecoder(target, draft, k=4)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    r_spec, r_plain = _decode_pair(target, spec, audio, _opts())
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)
    assert r_spec.avg_logprob == pytest.approx(r_plain.avg_logprob, abs=1e-4)
    assert r_spec.no_speech_prob == pytest.approx(r_plain.no_speech_prob, abs=1e-5)


def test_random_draft_exact_without_timestamps(target, draft, rng):
    spec = SpeculativeDecoder(target, draft, k=3)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    opts = _opts(without_timestamps=True, max_new_tokens=16)
    r_spec, r_plain = _decode_pair(target, spec, audio, opts)
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)


def test_random_draft_exact_with_repetition_penalty(target, draft, rng):
    """The rule replay includes the stateful repetition penalty."""
    spec = SpeculativeDecoder(target, draft, k=4)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    opts = _opts(repetition_penalty=1.3, max_new_tokens=16)
    r_spec, r_plain = _decode_pair(target, spec, audio, opts)
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)


def test_budget_cap_matches_plain(target, draft, rng):
    spec = SpeculativeDecoder(target, draft, k=4)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    opts = _opts(max_new_tokens=5)
    r_spec, r_plain = _decode_pair(target, spec, audio, opts)
    assert len(r_spec.tokens) <= 5
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)


def test_self_draft_accepts_and_batches_rounds(target, rng):
    """Draft == target: proposals agree (up to window-vs-step float
    noise), so each verify round commits ~k+1 tokens instead of 1."""
    spec = SpeculativeDecoder(target, target, k=4)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    opts = _opts(max_new_tokens=24)
    r_spec, r_plain = _decode_pair(target, spec, audio, opts)
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)
    emitted = spec.stats["emitted"]
    iters = spec.stats["iterations"]
    assert emitted >= 20
    # perfect acceptance would be ceil((emitted-1)/(k+1)) rounds; allow
    # slack for occasional float-tie rejections
    assert iters <= (emitted // (spec.k + 1)) + 3, (iters, emitted)
    assert spec.acceptance_rate() > 0.7


def test_incompatible_draft_rejected(target):
    import jax.numpy as jnp

    bad_vocab = _cfg(1).replace(n_vocab=51864)
    eng = WhisperEngine(
        bad_vocab, init_params(bad_vocab, 1), compute_dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="vocabulary"):
        SpeculativeDecoder(target, eng)

    bad_enc = _cfg(1).replace(n_audio_state=32)
    eng2 = WhisperEngine(
        bad_enc, init_params(bad_enc, 1), compute_dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="encoder geometry"):
        SpeculativeDecoder(target, eng2)


def test_transcriber_seek_loop_with_draft_matches_plain(target, draft, rng):
    """End-to-end offline path: the speculative Transcriber's segments are
    identical to the plain Transcriber's (same seek loop, same tokens)."""
    from whisperlive_tpu.engine.transcribe import Transcriber

    audio = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
    opts = _opts(max_new_tokens=20)
    plain_segments, _ = Transcriber(target).transcribe(audio, opts)
    spec = SpeculativeDecoder(target, draft, k=4)
    spec_segments, _ = Transcriber(target, spec_decoder=spec).transcribe(
        audio, opts
    )
    assert len(plain_segments) == len(spec_segments)
    for a, b in zip(plain_segments, spec_segments):
        assert a.tokens == b.tokens
        assert a.start == pytest.approx(b.start)
        assert a.end == pytest.approx(b.end)


def test_random_draft_exact_with_no_repeat_ngram(target, draft, rng):
    """no_repeat_ngram_size is a static program arg — the replay must
    plumb it through both the draft scan and the verify scan."""
    spec = SpeculativeDecoder(target, draft, k=4)
    audio = (rng.standard_normal((1, 480000)) * 0.1).astype(np.float32)
    opts = _opts(no_repeat_ngram_size=2, max_new_tokens=16)
    r_spec, r_plain = _decode_pair(target, spec, audio, opts)
    np.testing.assert_array_equal(r_spec.tokens, r_plain.tokens)


def _run_scheduler_once(engine, spec, audio, options):
    from whisperlive_tpu.engine.scheduler import BatchRequest, BatchScheduler

    sched = BatchScheduler(engine, max_batch_size=2, batch_window_ms=5.0,
                           spec_decoder=spec)
    sched.start()
    try:
        req = BatchRequest(audio=audio, options=options, language="en",
                           uid="s0")
        result = sched.submit(req).result(timeout=300)
    finally:
        sched.stop()
    return result


def test_scheduler_speculative_route_parity(target, draft, rng):
    """A lone greedy request through the window scheduler produces the
    SAME tokens whether or not the speculative route is attached."""
    audio = (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    opts = _opts(max_new_tokens=16)
    plain = _run_scheduler_once(target, None, audio, opts)
    spec = SpeculativeDecoder(target, draft, k=4)
    routed = _run_scheduler_once(target, spec, audio, opts)
    assert spec.stats["windows"] == 1  # the route actually ran
    plain_toks = [t for s in plain.segments for t in s.tokens]
    routed_toks = [t for s in routed.segments for t in s.tokens]
    assert routed_toks == plain_toks
    assert routed.language == plain.language


def test_scheduler_speculative_route_guards(target, draft, rng):
    """Beamed, multi-temperature-first, and word-timestamp requests must
    NOT take the speculative route."""
    import dataclasses

    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    spec = SpeculativeDecoder(target, draft, k=3)

    beamed = dataclasses.replace(_opts(max_new_tokens=8), beam_size=2)
    _run_scheduler_once(target, spec, audio, beamed)
    assert spec.stats["windows"] == 0

    sampled = dataclasses.replace(_opts(max_new_tokens=8),
                                  temperatures=(0.4,))
    _run_scheduler_once(target, spec, audio, sampled)
    assert spec.stats["windows"] == 0

    word_ts = dataclasses.replace(_opts(max_new_tokens=8),
                                  word_timestamps=True)
    _run_scheduler_once(target, spec, audio, word_ts)
    assert spec.stats["windows"] == 0  # alignment stays on the split path


def test_seek_loop_word_timestamps_with_draft(target, draft, rng):
    """word_timestamps ride the alignment pass AFTER the decode, so the
    speculative seek loop must produce the same words as the plain one."""
    import dataclasses

    from whisperlive_tpu.engine.transcribe import Transcriber

    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    opts = dataclasses.replace(_opts(max_new_tokens=14), word_timestamps=True)
    plain_segments, _ = Transcriber(target).transcribe(audio, opts)
    spec = SpeculativeDecoder(target, draft, k=3)
    spec_segments, _ = Transcriber(target, spec_decoder=spec).transcribe(
        audio, opts
    )
    assert len(plain_segments) == len(spec_segments)
    for a, b in zip(plain_segments, spec_segments):
        assert a.tokens == b.tokens
        wa = [(w.word, w.start, w.end) for w in (a.words or [])]
        wb = [(w.word, w.start, w.end) for w in (b.words or [])]
        assert wa == wb
