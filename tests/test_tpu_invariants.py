"""TPU-specific invariants (SURVEY §4 implication): fixed-shape padding
must not change results, option changes must not recompile, and the
scheduler must stay fair under load."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.models.whisper import WhisperConfig, init_params
from whisperlive_tpu.ops.mel import N_SAMPLES, pad_or_trim


@pytest.fixture(scope="module")
def engine():
    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=100, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=64, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    return WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
        batch_buckets=(1, 2, 4), prompt_buckets=(8, 16),
    )


OPTS = dict(
    language="en", temperatures=(0.0,), log_prob_threshold=None,
    no_speech_threshold=None, compression_ratio_threshold=None,
    max_new_tokens=10,
)


def _mel_for(engine, audio_batch):
    t = 2 * engine.cfg.n_audio_ctx
    mel = np.zeros((len(audio_batch), t, 80), np.float32)
    for i, a in enumerate(audio_batch):
        mel[i] = a
    return mel


def test_batch_padding_invariance(engine, rng):
    """An item's decode output must not depend on batch-bucket padding."""
    t = 2 * engine.cfg.n_audio_ctx
    item = rng.standard_normal((t, 80)).astype(np.float32) * 0.1
    other = rng.standard_normal((t, 80)).astype(np.float32) * 0.1
    opts = TranscribeOptions(**OPTS)
    p, s = engine.build_prompt(opts)

    _, cross1 = engine.prepare_mel(_mel_for(engine, [item]))
    (r1,) = engine.decode_batch(cross1, [p], [s], opts)

    _, cross2 = engine.prepare_mel(_mel_for(engine, [item, other]))
    r2 = engine.decode_batch(cross2, [p, p], [s, s], opts)[0]

    np.testing.assert_array_equal(r1.tokens, r2.tokens)
    assert r1.avg_logprob == pytest.approx(r2.avg_logprob, abs=1e-4)


def test_option_values_do_not_recompile(engine, rng):
    """Per-request knobs (language, temperature, penalties, max_new within
    a bucket) are array inputs — changing them must reuse the compiled
    decode program."""
    t = 2 * engine.cfg.n_audio_ctx
    mel = _mel_for(engine, [rng.standard_normal((t, 80)).astype(np.float32)])
    _, cross = engine.prepare_mel(mel)

    variants = [
        TranscribeOptions(**{**OPTS, "language": "en"}),
        TranscribeOptions(**{**OPTS, "language": "de"}),
        TranscribeOptions(**{**OPTS, "temperatures": (0.4,)}),
        TranscribeOptions(**{**OPTS, "repetition_penalty": 1.2}),
        TranscribeOptions(**{**OPTS, "max_new_tokens": 6}),
    ]
    p0, s0 = engine.build_prompt(variants[0])
    engine.decode_batch(cross, [p0], [s0], variants[0])  # prime the program
    before = engine._decode_fn._cache_size()
    for opts in variants[1:]:
        p, s = engine.build_prompt(opts)
        engine.decode_batch(cross, [p], [s], opts)
    # all variants reuse the (batch=1, prompt=8, cache bucket) program
    assert engine._decode_fn._cache_size() == before


def test_prompt_bucket_reuse(engine, rng):
    """Different prompt LENGTHS within one bucket share a program."""
    t = 2 * engine.cfg.n_audio_ctx
    mel = _mel_for(engine, [rng.standard_normal((t, 80)).astype(np.float32)])
    _, cross = engine.prepare_mel(mel)
    before = engine._decode_fn._cache_size()
    opts = TranscribeOptions(**OPTS)
    for prev in ([], [100], [100, 101, 102]):
        p, s = engine.build_prompt(opts, previous_tokens=prev)
        engine.decode_batch(cross, [p], [s], opts)
    after = engine._decode_fn._cache_size()
    assert after - before <= 1


def test_scheduler_fairness_under_load():
    """Many submitters: every request completes, none starves."""
    import queue as q

    from whisperlive_tpu.engine.scheduler import BatchRequest, BatchScheduler
    from tests.test_scheduler import FakeEngine

    sched = BatchScheduler(FakeEngine(), max_batch_size=4, batch_window_ms=10)
    sched.start()
    try:
        reqs = [
            BatchRequest(
                audio=np.zeros(16000, np.float32),
                options=TranscribeOptions(language="en"),
                uid=f"u{i}",
            )
            for i in range(25)
        ]
        for r in reqs:
            sched.submit(r)
        for r in reqs:
            r.future.result(timeout=20)  # nobody starves
    finally:
        sched.stop()
