"""Prompt construction semantics (get_prompt, transcriber_faster_whisper.py:1480-1513)."""

import pytest

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.models.whisper import WhisperConfig, init_params


@pytest.fixture(scope="module")
def eng():
    import jax.numpy as jnp

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    return WhisperEngine(cfg, init_params(cfg), compute_dtype=jnp.float32)


def test_basic_sot_sequence(eng):
    prompt, sot_idx = eng.build_prompt(TranscribeOptions(language="en"))
    tok = eng.tokenizer
    assert prompt == [tok.sot, tok.spec.language_token("en"), tok.spec.transcribe]
    assert sot_idx == 0


def test_translate_task(eng):
    prompt, _ = eng.build_prompt(TranscribeOptions(language="de", task="translate"))
    assert prompt[2] == eng.tokenizer.spec.translate


def test_without_timestamps_appends_notimestamps(eng):
    prompt, _ = eng.build_prompt(TranscribeOptions(language="en", without_timestamps=True))
    assert prompt[-1] == eng.tokenizer.no_timestamps


def test_initial_prompt_prefixed_with_sot_prev(eng):
    opts = TranscribeOptions(language="en", initial_prompt="hello")
    prompt, sot_idx = eng.build_prompt(opts)
    tok = eng.tokenizer
    assert prompt[0] == tok.sot_prev
    assert prompt[1 : 1 + len(tok.encode(" hello"))] == tok.encode(" hello")
    assert prompt[sot_idx] == tok.sot


def test_initial_prompt_serving_vs_preseeded(eng):
    tok = eng.tokenizer
    hello = tok.encode(" hello")
    opts = TranscribeOptions(language="en", initial_prompt="hello")

    # serving default: initial_prompt rides EVERY window ahead of the
    # session context (reference backend passes initial_prompt into each
    # per-window transcribe call, faster_whisper_backend.py:219,238)
    prompt, _ = eng.build_prompt(opts, previous_tokens=[500, 501])
    assert prompt[0] == tok.sot_prev
    assert prompt[1 : 1 + len(hello)] == hello
    assert 500 in prompt and 501 in prompt

    # offline seek loop (context_preseeded=True): the caller seeds
    # initial_prompt into its rolling context, so build_prompt must NOT
    # re-add it (reference get_prompt has no initial_prompt at all) and
    # previous tokens ride ungated
    prompt2, _ = eng.build_prompt(
        opts, previous_tokens=[500, 501], context_preseeded=True
    )
    assert prompt2[0] == tok.sot_prev
    assert prompt2[1:3] == [500, 501]
    assert prompt2[1 : 1 + len(hello)] != hello

    # preseeded context ignores condition_on_previous_text (the seek loop
    # gates via prompt_reset_since instead)
    nocond = TranscribeOptions(language="en",
                               condition_on_previous_text=False)
    prompt3, _ = eng.build_prompt(
        nocond, previous_tokens=[7, 8], context_preseeded=True
    )
    assert prompt3[1:3] == [7, 8]


def test_hotwords_used_when_no_prefix(eng):
    opts = TranscribeOptions(language="en", hotwords="JAX TPU")
    prompt, _ = eng.build_prompt(opts)
    tok = eng.tokenizer
    assert prompt[0] == tok.sot_prev
    joined = prompt[1 : 1 + len(tok.encode(" JAX TPU"))]
    assert joined == tok.encode(" JAX TPU")


def test_prefix_appended_after_sot_sequence(eng):
    opts = TranscribeOptions(language="en", prefix="so far")
    prompt, sot_idx = eng.build_prompt(opts)
    tok = eng.tokenizer
    tail = prompt[sot_idx + 3 :]
    assert tail == tok.encode(" so far")


def test_condition_on_previous_disabled(eng):
    opts = TranscribeOptions(language="en", condition_on_previous_text=False)
    prompt, sot_idx = eng.build_prompt(opts, previous_tokens=[7, 8, 9])
    assert sot_idx == 0  # no sot_prev block at all


def test_previous_tokens_truncated_to_half_ctx(eng):
    opts = TranscribeOptions(language="en")
    prev = list(range(600, 600 + 400))
    prompt, sot_idx = eng.build_prompt(opts, previous_tokens=prev)
    # at most n_text_ctx // 2 - 1 = 223 prev tokens survive
    assert sot_idx <= 224
    assert prompt[sot_idx - 1] == prev[-1] + 0 if sot_idx > 1 else True
    assert prompt[1:sot_idx] == prev[-(sot_idx - 1):]


def test_prompt_fits_largest_bucket_trims_prev_first(eng):
    """previous_tokens + prefix can reach ~450 tokens; the composed prompt
    must fit the largest prompt bucket with the sot sequence + prefix tail
    intact (prev conditioning is trimmed first). ADVICE r1: _pad_prompts
    used to silently chop the tail off."""
    tok = eng.tokenizer
    prev = list(range(300, 300 + 224))
    prefix = " ".join(["word"] * 300)  # > half-ctx worth of prefix tokens
    opts = TranscribeOptions(language="en", prefix=prefix)
    prompt, sot_idx = eng.build_prompt(opts, previous_tokens=prev)
    pmax = eng.prompt_buckets[-1]
    assert len(prompt) <= pmax
    # sot sequence survives at sot_idx
    assert prompt[sot_idx] == tok.sot
    assert prompt[sot_idx + 1] == tok.spec.language_token("en")
    # prefix tail survives verbatim at the end
    prefix_tokens = tok.encode(" " + prefix.strip())[-(eng.cfg.n_text_ctx // 2 - 1):]
    assert prompt[-len(prefix_tokens):] == prefix_tokens


def test_all_temperatures_fail_keeps_best_attempt(eng):
    """When every temperature fails the gates, the returned result is the
    best attempt (highest avg_logprob among below-compression-ratio ones),
    stamped with the final temperature
    (transcriber_faster_whisper.py:1464-1477)."""
    import numpy as np

    from whisperlive_tpu.engine.engine import DecodeResult

    attempts = iter(
        [
            # T=0.0: best logprob but compression ratio too high
            [DecodeResult(np.array([1, 2]), -0.5, 0.0, 9.0, 0.0)],
            # T=0.5: acceptable CR, decent logprob (the winner)
            [DecodeResult(np.array([3, 4]), -1.4, 0.0, 1.0, 0.5)],
            # T=1.0: acceptable CR, worst logprob
            [DecodeResult(np.array([5, 6]), -3.0, 0.0, 1.0, 1.0)],
        ]
    )
    orig = eng.decode_batch
    eng.decode_batch = lambda *a, **k: next(attempts)
    try:
        opts = TranscribeOptions(
            language="en",
            temperatures=(0.0, 0.5, 1.0),
            log_prob_threshold=-1.0,  # all three fail this
            compression_ratio_threshold=2.4,
            no_speech_threshold=None,
        )
        (res,) = eng.decode_with_fallback(None, [[1]], [0], opts)
    finally:
        eng.decode_batch = orig
    assert list(res.tokens) == [3, 4]
    assert res.avg_logprob == -1.4
    assert res.temperature == 1.0  # final temperature for prompt reset
