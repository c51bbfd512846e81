"""Mixed speculative routing (--continuous_spec_mode mixed): full
re-decodes ride a second speculative continuous pool, short incremental
tails stay plain on the main pool, and an acceptance-EMA hysteresis falls
back to plain when the draft stops paying for its verify rounds.

Rationale (BENCH_NOTES round 4, chip-measured): a verify round costs ~2
plain steps of HBM and commits 1 + a*k tokens — it wins on ~100-step full
re-decodes (+15-40% update throughput, better p95) and loses on ~10-token
incremental tails at any realistic acceptance. The reference has no
speculative decoding at all (SURVEY §2.15); the routing here keeps its
implicit RTF<1 contract at strictly better device economics.

Token-exactness of each pool is pinned elsewhere (tests/
test_continuous_spec.py, tests/test_continuous.py); these tests pin the
ROUTING and the hysteresis state machine.
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
    cfg_d = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    engine = WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
        batch_buckets=(1, 2),
    )
    draft = WhisperEngine(
        cfg_d, init_params(cfg_d, 7), compute_dtype=jnp.float32,
        batch_buckets=(1, 2),
    )
    scheduler = BatchScheduler(engine, max_batch_size=2, batch_window_ms=10)
    scheduler.start()
    continuous = ContinuousScheduler(
        engine, n_slots=2, steps_per_chunk=4, prompt_pad=48, ring=64,
    )
    continuous.start()
    spec_sched = ContinuousScheduler(
        engine, draft_engine=draft, spec_k=2, n_slots=2,
        steps_per_chunk=2, prompt_pad=48, ring=64,
    )
    spec_sched.start()
    backend = TpuBackend(
        scheduler, continuous_scheduler=continuous,
        spec_scheduler=spec_sched,
    )
    routes = []
    for which, sched in (
        ("window", scheduler), ("plain", continuous), ("spec", spec_sched)
    ):
        orig = sched.submit

        def wrapped(req, _orig=orig, _which=which):
            routes.append((_which, tuple(req.prefix_tokens)))
            return _orig(req)

        sched.submit = wrapped
    try:
        yield backend, routes
    finally:
        spec_sched.stop()
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


_HYP = tuple(range(100, 120))


def test_full_redecode_routes_to_spec_pool(stack):
    backend, routes = stack
    result = _call(backend, _speech(1.0), 0.0, uid="f0")
    assert routes[-1][0] == "spec" and routes[-1][1] == ()
    assert result is not None
    assert backend.spec_route_stats["spec_fulls"] >= 1
    backend.release("f0")


def test_incremental_tail_stays_plain(stack):
    backend, routes = stack
    backend._prefix_cache["t0"] = (0.0, _HYP)
    backend._prefix_streak["t0"] = 0
    _call(backend, _speech(1.2, seed=1), 0.0, uid="t0")
    which, prefix = routes[-1]
    assert which == "plain"
    assert prefix == backend._trim_prefix(_HYP)
    backend.release("t0")


def test_refresh_streak_routes_full_to_spec(stack):
    backend, routes = stack
    saved = backend.prefix_refresh
    backend.prefix_refresh = 2
    try:
        seen = []
        for _ in range(3):
            backend._prefix_cache["t1"] = (0.0, _HYP)
            _call(backend, _speech(1.1, seed=2), 0.0, uid="t1")
            seen.append(routes[-1][0])
        assert seen == ["plain", "plain", "spec"]
    finally:
        backend.prefix_refresh = saved
        backend.release("t1")


def test_spec_and_plain_full_decodes_token_identical(stack):
    """Greedy token-exactness across the ROUTE: the same window decoded
    by the spec pool (random never-agreeing draft) and by the plain pool
    must produce identical tokens — routing only changes latency."""
    backend, routes = stack
    audio = _speech(1.4, seed=5)
    r_spec = _call(backend, audio, 0.0, uid="p0")
    assert routes[-1][0] == "spec"
    backend.release("p0")
    backend._spec_enabled = False
    backend.spec_probe_s = 1e9  # no probes: force the plain route
    backend._spec_last_probe = __import__("time").monotonic()
    try:
        r_plain = _call(backend, audio, 0.0, uid="p1")
        assert routes[-1][0] == "plain"
    finally:
        backend._spec_enabled = True
        backend.release("p1")
    assert r_spec.raw_tokens == r_plain.raw_tokens


def test_hysteresis_disables_below_breakeven_and_reenables(stack):
    backend, _ = stack
    sched = backend.spec_scheduler
    saved = (sched.acceptance_ema, sched._acc_ema_n, backend.spec_probe_s)
    try:
        # warm EMA below breakeven -> one decision flips the route off
        sched.acceptance_ema, sched._acc_ema_n = 0.05, backend.spec_warm_windows + 1
        backend._spec_enabled = True
        backend.spec_probe_s = 1e9
        assert backend._spec_route() is False
        assert backend._spec_enabled is False
        d0 = backend.spec_route_stats["disables"]
        # stays off (no probe due yet)
        assert backend._spec_route() is False
        assert backend.spec_route_stats["disables"] == d0
        # probe interval elapsed -> exactly one probe window goes through
        backend.spec_probe_s = 0.0
        assert backend._spec_route() is True
        assert backend.spec_route_stats["probes"] >= 1
        # recovery: EMA above the upper band re-enables
        backend.spec_probe_s = 1e9
        sched.acceptance_ema = 0.6
        assert backend._spec_route() is True
        assert backend._spec_enabled is True
        assert backend.spec_route_stats["reenables"] >= 1
        # hysteresis band: EMA between breakeven and re-enable keeps the
        # current state (no flapping)
        sched.acceptance_ema = 0.3
        assert backend._spec_route() is True
        assert backend._spec_enabled is True
    finally:
        sched.acceptance_ema, sched._acc_ema_n, backend.spec_probe_s = saved
        backend._spec_enabled = True


def test_random_draft_organically_trips_the_breaker(stack):
    """End-to-end hysteresis: a random draft accepts ~nothing, so after
    the EMA warms up (5 windows) full re-decodes fall back to plain."""
    backend, routes = stack
    sched = backend.spec_scheduler
    saved = (sched.acceptance_ema, sched._acc_ema_n)
    sched.acceptance_ema, sched._acc_ema_n = 0.0, 0
    backend._spec_enabled = True
    backend.spec_probe_s = 1e9
    saved_warm = backend.spec_warm_windows
    backend.spec_warm_windows = 3  # the EMA sees 6 windows in this test
    try:
        for i in range(6):
            _call(backend, _speech(1.0, seed=10 + i), 0.0, uid=f"h{i}")
            backend.release(f"h{i}")
        assert sched._acc_ema_n >= backend.spec_warm_windows
        assert not backend._spec_enabled
        assert routes[-1][0] == "plain"
    finally:
        backend.spec_warm_windows = saved_warm
        sched.acceptance_ema, sched._acc_ema_n = saved
        backend._spec_enabled = True


def test_spec_scheduler_conflicts_with_hybrid_beam(stack):
    backend, _ = stack
    with pytest.raises(ValueError):
        TpuBackend(
            backend.scheduler,
            continuous_scheduler=backend.continuous_scheduler,
            spec_scheduler=backend.spec_scheduler,
            beam_size=3, beam_mode="refresh",
        )
