"""Hybrid beam serving (--beam_mode refresh): greedy incremental partials
on the continuous pool, beamed full re-decodes on the window scheduler,
beamed hypotheses re-seeding the prefix cache greedy partials extend.

The reference decodes beam-5 on every window (vendored transcriber
default, transcriber_faster_whisper.py:694-700); a fully-beamed
continuous pool divides the slot budget by the lane count and saturates
(BENCH_NOTES r3). Hybrid mode keeps beam quality on everything durable —
the periodic WL_PREFIX_REFRESH re-decodes and the post-commit
from-scratch decodes re-derive the FULL hypothesis with beam — while
partials stay greedy continuations of those beamed hypotheses.
"""

import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.engine.continuous import ContinuousScheduler
from whisperlive_tpu.engine.engine import WhisperEngine
from whisperlive_tpu.engine.scheduler import BatchScheduler
from whisperlive_tpu.models.whisper import WhisperConfig, init_params
from whisperlive_tpu.serving import backends as backends_mod
from whisperlive_tpu.serving.backends import TpuBackend
from whisperlive_tpu.serving.session import SessionOptions


def _speech(seconds, seed=0):
    t = np.arange(int(16000 * seconds)) / 16000.0
    rng = np.random.default_rng(seed)
    f0 = 140 + 40 * np.sin(2 * np.pi * 2.1 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in (1, 2, 3))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 3.7 * t)
    sig = sig * am + 0.02 * rng.standard_normal(t.shape)
    return (0.12 * sig / np.max(np.abs(sig))).astype(np.float32)


@pytest.fixture(scope="module")
def stack():
    saved = (
        backends_mod._DISABLE_GATES,
        backends_mod.STREAMING_MAX_NEW_TOKENS,
    )
    backends_mod._DISABLE_GATES = True
    backends_mod.STREAMING_MAX_NEW_TOKENS = 12

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    engine = WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
        batch_buckets=(1, 2),
    )
    scheduler = BatchScheduler(engine, max_batch_size=2, batch_window_ms=10)
    scheduler.start()
    continuous = ContinuousScheduler(
        engine, n_slots=2, steps_per_chunk=4, prompt_pad=48, ring=64,
    )
    continuous.start()
    backend = TpuBackend(
        scheduler, continuous_scheduler=continuous,
        beam_size=3, beam_mode="refresh",
    )
    routes = []
    for which, sched in (("window", scheduler), ("continuous", continuous)):
        orig = sched.submit

        def wrapped(req, _orig=orig, _which=which):
            routes.append(
                (_which, req.options.beam_size, tuple(req.prefix_tokens))
            )
            return _orig(req)

        sched.submit = wrapped
    try:
        yield backend, routes
    finally:
        continuous.stop()
        scheduler.stop()
        (
            backends_mod._DISABLE_GATES,
            backends_mod.STREAMING_MAX_NEW_TOKENS,
        ) = saved


def _call(backend, audio, anchor, uid="u0"):
    return asyncio.run(
        backend.transcribe(
            audio,
            SessionOptions(language="en", use_vad=False),
            language="en",
            uid=uid,
            window_anchor_s=anchor,
        )
    )


# a plausible carried hypothesis: plain text tokens, long enough that
# _trim_prefix (drop last 4, need >= 8) yields a usable prefix
_HYP = tuple(range(100, 120))


def test_first_window_full_decode_is_beamed_and_seeds_prefix(stack):
    backend, routes = stack
    assert backend.hybrid_beam
    result = _call(backend, _speech(1.0), 0.0, uid="seed")
    assert routes[-1][0] == "window" and routes[-1][1] == 3
    assert result is not None
    if result.raw_tokens:
        # the beamed hypothesis is what the next partial will extend
        assert backend._prefix_cache["seed"] == (0.0, result.raw_tokens)


def test_partials_greedy_on_continuous_with_beamed_prefix(stack):
    backend, routes = stack
    backend._prefix_cache["u0"] = (0.0, _HYP)
    backend._prefix_streak["u0"] = 0
    _call(backend, _speech(1.2, seed=1), 0.0)
    which, beam, prefix = routes[-1]
    assert which == "continuous" and beam == 1
    assert prefix == backend._trim_prefix(_HYP)


def test_refresh_streak_routes_full_beamed_decode(stack):
    backend, routes = stack
    saved = backend.prefix_refresh
    backend.prefix_refresh = 2
    try:
        seen = []
        for _ in range(3):
            backend._prefix_cache["u1"] = (0.0, _HYP)
            _call(backend, _speech(1.1, seed=2), 0.0, uid="u1")
            seen.append(routes[-1][:2])
        assert seen[0] == ("continuous", 1)
        assert seen[1] == ("continuous", 1)
        assert seen[2] == ("window", 3)  # periodic refresh carries the beam
        assert backend._prefix_streak["u1"] == 0
        assert backend.hybrid_stats["greedy_partials"] >= 2
        assert backend.hybrid_stats["beamed_fulls"] >= 1
    finally:
        backend.prefix_refresh = saved
        backend.release("u1")


def test_anchor_move_evicts_and_beams_from_scratch(stack):
    backend, routes = stack
    backend._prefix_cache["u2"] = (0.0, _HYP)
    backend._prefix_streak["u2"] = 1
    _call(backend, _speech(1.0, seed=3), 2.5, uid="u2")
    which, beam, prefix = routes[-1]
    # commit moved the anchor: from-scratch decode carries the beam
    assert which == "window" and beam == 3 and prefix == ()
    assert backend._prefix_streak.get("u2", 0) == 0
    backend.release("u2")


def test_full_mode_unchanged(stack):
    # beam_mode="full" (default): a beam-width mismatch with the greedy
    # pool falls back to the window scheduler for EVERY request — the
    # pre-hybrid behavior
    backend, routes = stack
    full = TpuBackend(
        backend.scheduler,
        continuous_scheduler=backend.continuous_scheduler,
        beam_size=3,
    )
    assert not full.hybrid_beam
    full._prefix_cache["u3"] = (0.0, _HYP)
    _call(full, _speech(1.0, seed=4), 0.0, uid="u3")
    assert routes[-1][0] == "window" and routes[-1][1] == 3
