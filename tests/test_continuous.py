"""Decode-step-level continuous batching (engine/continuous.py).

The critical invariant: a window that JOINS a running decode mid-flight
produces exactly the tokens it would have produced in a fresh lockstep
decode — the ring-buffer KV masking and per-slot rule state fully isolate
slots at different generation depths.
"""

import dataclasses
import time

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.engine.continuous import ContinuousEngine, ContinuousScheduler
from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.scheduler import BatchRequest
from whisperlive_tpu.models.whisper import WhisperConfig, init_params
from whisperlive_tpu.ops import mel as mel_ops


@pytest.fixture(scope="module")
def engine():
    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    return WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32, batch_buckets=(1, 2)
    )


OPTS = TranscribeOptions(
    language="en", temperatures=(0.0,), log_prob_threshold=None,
    no_speech_threshold=None, compression_ratio_threshold=None,
    max_new_tokens=20,
)


def _audio(engine_rng, seconds):
    return (engine_rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def _lockstep_tokens(eng, audio, max_new=20):
    buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    buf[0, : len(audio)] = audio
    _, cross = eng.prepare(buf)
    p, s = eng.build_prompt(OPTS, language="en")
    (res,) = eng.decode_with_fallback(cross, [p], [s], OPTS)
    return [int(t) for t in res.tokens]


def _run_slot(cb, slot, join, status_fn):
    """Step until the slot finishes; return its tokens."""
    for _ in range(100):
        status = cb.step()
        if status[slot, 1] > 0.5:
            gen = int(status[slot, 2])
            toks = cb.harvest(slot, join, gen)
            return [int(t) for t in toks if t != cb.eng.spec.eot]
    raise AssertionError("slot never finished")


def test_midflight_join_token_parity(engine, rng):
    """Item B joins while item A is mid-generation; both must match their
    fresh lockstep decodes token for token."""
    # cross_ctx pinned to the full encoder context: these tests verify the
    # ring-masking invariant against the full-context lockstep decode; the
    # content cap (a deliberate behavioral difference, TRT padding-removal
    # analogue) is covered separately below.
    cb = ContinuousEngine(engine, n_slots=2, prompt_pad=16, ring=64,
                          steps_per_chunk=3, cross_ctx=1500)
    cb.init_state()
    a = _audio(rng, 3.0)
    b = _audio(rng, 2.0)
    p, s = engine.build_prompt(OPTS, language="en")

    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    gstep = 0
    # run a few chunks so A is mid-flight
    cb.step(); cb.step()
    gstep += 2 * cb.steps_per_chunk
    # B joins now
    cb.insert(np.stack([b]), [p], [s], [True], [1], [0.0], [True], [1.0], [20])
    join_b = gstep

    # run both to completion
    a_done = b_done = None
    for _ in range(100):
        status = cb.step()
        gstep += cb.steps_per_chunk
        if a_done is None and status[0, 1] > 0.5:
            a_done = cb.harvest(0, 0, int(status[0, 2]))
        if b_done is None and status[1, 1] > 0.5:
            b_done = cb.harvest(1, join_b, int(status[1, 2]))
        if a_done is not None and b_done is not None:
            break
    assert a_done is not None and b_done is not None

    strip = lambda toks: [int(t) for t in toks if t != engine.spec.eot]
    assert strip(a_done) == _lockstep_tokens(engine, a)
    assert strip(b_done) == _lockstep_tokens(engine, b)


def test_slot_reuse_after_release(engine, rng):
    """A slot reused for a second request (ring wraps past old data) must
    decode independently of the first occupant."""
    cb = ContinuousEngine(engine, n_slots=1, prompt_pad=16, ring=32,
                          steps_per_chunk=4, cross_ctx=1500)
    cb.init_state()
    p, s = engine.build_prompt(OPTS, language="en")
    a = _audio(rng, 2.0)
    b = _audio(rng, 4.0)

    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0], [15])
    gstep = 0
    status = None
    for _ in range(50):
        status = cb.step()
        gstep += cb.steps_per_chunk
        if status[0, 1] > 0.5:
            break
    toks_a = cb.harvest(0, 0, int(status[0, 2]))
    cb.release([0])

    cb.insert(np.stack([b]), [p], [s], [True], [0], [0.0], [True], [1.0], [15])
    join_b = gstep
    for _ in range(50):
        status = cb.step()
        gstep += cb.steps_per_chunk
        if status[0, 1] > 0.5:
            break
    toks_b = cb.harvest(0, join_b, int(status[0, 2]))

    strip = lambda toks: [int(t) for t in toks if t != engine.spec.eot]
    assert strip(toks_a) == _lockstep_tokens(engine, a, 15)[:15]
    assert strip(toks_b) == _lockstep_tokens(engine, b, 15)[:15]


def test_scheduler_end_to_end(engine, rng):
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        futs = []
        for i in range(4):  # more requests than slots: queueing exercised
            audio = _audio(rng, 2.0 + i * 0.5)
            req = BatchRequest(audio=audio, options=OPTS, uid=f"r{i}")
            futs.append((req, sched.submit(req)))
            time.sleep(0.05)
        for req, f in futs:
            r = f.result(timeout=180)
            assert r.language == "en"
            assert r.duration == pytest.approx(len(req.audio) / 16000)
            # random weights: token stream exists even if byte-decoded text
            # is empty; the partials path requires duration/advance sanity
            assert 0 < r.advance_s <= r.duration + 1e-6
    finally:
        sched.stop()


def test_scheduler_language_detection(engine, rng):
    opts = TranscribeOptions(
        language=None, temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="lang")
        r = sched.submit(req).result(timeout=180)
        assert r.language in engine.tokenizer.spec.language_codes
        assert 0.0 <= r.language_prob <= 1.0
    finally:
        sched.stop()


def test_scheduler_temperature_retry(engine, rng):
    """A window failing the quality gates at T=0 is re-inserted at the next
    temperature (retry = just another insert), and the final result carries
    the retry temperature."""
    opts = TranscribeOptions(
        language="en", temperatures=(0.0, 0.9),
        log_prob_threshold=0.0,  # unreachable: every decode "fails"
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="retry")
        r = sched.submit(req).result(timeout=180)
        if r.segments:
            assert r.segments[0].temperature == pytest.approx(0.9)
    finally:
        sched.stop()


def test_worker_survives_bad_request(engine, rng):
    """A request that blows up mid-processing must not kill the worker."""
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        bad = BatchRequest(audio=np.zeros(0, np.float32), options=OPTS, uid="bad")
        fb = sched.submit(bad)
        good = BatchRequest(audio=_audio(rng, 2.0), options=OPTS, uid="good")
        fg = sched.submit(good)
        # bad may error or resolve empty; good MUST resolve
        try:
            fb.result(timeout=180)
        except Exception:
            pass
        r = fg.result(timeout=180)
        assert r.duration == pytest.approx(2.0)
    finally:
        sched.stop()


def test_cross_ctx_content_cap_shapes_and_decode(engine, rng):
    """Default continuous mode caps resident cross-KV at cross_ctx
    positions (TRT padding-removal analogue, transcriber_tensorrt.py:79-149)
    and still decodes short windows end-to-end."""
    cb = ContinuousEngine(engine, n_slots=1, prompt_pad=16, ring=32,
                          steps_per_chunk=4)
    assert cb.cross_ctx == 640  # default for 1500-ctx models
    assert abs(cb.max_window_s - 12.8) < 1e-6
    cb.init_state()
    leaf = next(
        cb.state["cross_kv"][k] for k in ("kv", "kv8", "kv4")
        if k in cb.state["cross_kv"]
    )
    assert 640 in leaf.shape  # capped position axis
    p, s = engine.build_prompt(OPTS, language="en")
    a = _audio(rng, 2.0)
    buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    buf[0, : len(a)] = a
    cb.insert(buf, [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    toks = _run_slot(cb, 0, 0, None)
    assert len(toks) > 0


def test_long_windows_route_to_window_scheduler(engine):
    from whisperlive_tpu.serving.backends import TpuBackend

    class _Win:
        pass

    class _Cont:
        max_window_s = 12.8

    backend = TpuBackend(_Win(), continuous_scheduler=_Cont())
    topts = TranscribeOptions()
    assert backend._pick_scheduler(topts, 5.0) is backend.continuous_scheduler
    assert backend._pick_scheduler(topts, 20.0) is backend.scheduler
    assert backend._pick_scheduler(topts) is backend.continuous_scheduler


# ---------------------------------------------------------------------------
# Incremental partial decoding (prefix continuation)


def test_prefix_continuation_greedy_parity(engine, rng):
    """Forcing the first k tokens of a greedy decode as an incremental
    prefix must reproduce the remaining tokens exactly: the prefill carries
    the timestamp state (last_ts) and the decode-start rules must not
    re-fire mid-hypothesis."""
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=64, ring=64)
    sched.start()
    try:
        audio = _audio(rng, 3.0)
        req = BatchRequest(audio=audio, options=OPTS, uid="full")
        full = sched.submit(req).result(timeout=180).raw_tokens
        assert len(full) >= 12
        k = 10
        while k > 1 and full[k - 1] >= engine.spec.eot:
            k -= 1  # the carried hypothesis ends on a text token
        pre = full[:k]
        req2 = BatchRequest(audio=audio, options=OPTS, uid="inc",
                            prefix_tokens=pre)
        inc = sched.submit(req2).result(timeout=180).raw_tokens
        assert inc[:k] == tuple(pre)
        assert inc == full
    finally:
        sched.stop()


def test_prefix_dropped_on_gate_failure(engine, rng):
    """A prefix window whose (>= 12-token) sampled tail fails the quality
    gates retries WITHOUT the prefix at the SAME temperature (the carried
    hypothesis may be what failed), before any temperature ladder."""
    import dataclasses

    # always fails — and a budget that leaves a >= 12-token sampled tail
    # after the prefix, so the log-prob gate applies (short tails skip it)
    opts = dataclasses.replace(OPTS, log_prob_threshold=0.0,
                               max_new_tokens=60)
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=64, ring=64)
    sched.start()
    try:
        audio = _audio(rng, 3.0)
        base = BatchRequest(audio=audio, options=OPTS, uid="base")
        full = sched.submit(base).result(timeout=180).raw_tokens
        bogus = tuple(range(100, 112))  # NOT the greedy hypothesis
        req = BatchRequest(audio=audio, options=opts, uid="pfx",
                           prefix_tokens=bogus)
        r = sched.submit(req).result(timeout=180)
        # the retry dropped the forced prefix (req mutated in place) ...
        assert tuple(req.prefix_tokens) == ()
        # ... and a result whose final attempt still failed the gates is a
        # known-bad hypothesis: it must NOT be offered as the next
        # window's prefix
        assert r.raw_tokens == ()
        # sanity: an untainted decode of the same audio passes raw tokens
        assert len(full) > 0
    finally:
        sched.stop()


def test_short_tail_skips_logprob_gate(engine, rng):
    """A prefix continuation sampling only a handful of tokens must NOT be
    retried on the log-prob gate: a tail-only avg_logprob over < 12 tokens
    is noise (one unlucky word would drop a good carried hypothesis). The
    compression-ratio gate and WL_PREFIX_REFRESH still bound lock-in."""
    import dataclasses

    # max_new 20 - 12 prefix tokens -> 8-token sampled tail (< 12)
    opts = dataclasses.replace(OPTS, log_prob_threshold=0.0,
                               max_new_tokens=20)
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=64, ring=64)
    sched.start()
    try:
        audio = _audio(rng, 3.0)
        bogus = tuple(range(100, 112))
        req = BatchRequest(audio=audio, options=opts, uid="short",
                           prefix_tokens=bogus)
        r = sched.submit(req).result(timeout=180)
        # no prefix-drop retry: the forced prefix survives on the request
        assert tuple(req.prefix_tokens) == bogus
        # and the hypothesis (prefix + tail) is offered for the next window
        assert tuple(r.raw_tokens[: len(bogus)]) == bogus
    finally:
        sched.stop()


def test_backend_prefix_cache_anchor():
    """TpuBackend carries the previous window's raw tokens as the next
    request's prefix while the tail anchor is unchanged, and invalidates
    the cache when a commit moves the anchor."""
    import asyncio
    from types import SimpleNamespace

    from whisperlive_tpu.engine.scheduler import BatchResult
    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.session import SessionOptions

    captured = []

    class _Cont:
        max_window_s = 12.8

        def submit(self, req):
            captured.append(req)
            req.future.set_result(
                BatchResult(
                    segments=[SimpleNamespace(text="x")],
                    language="en", language_prob=1.0, duration=2.0,
                    advance_s=2.0,
                    raw_tokens=tuple([7] * 30),
                )
            )
            return req.future

    window = SimpleNamespace(
        engine=SimpleNamespace(spec=SimpleNamespace(eot=50257))
    )
    backend = TpuBackend(window, continuous_scheduler=_Cont())
    opts = SessionOptions(language="en", use_vad=False)
    chunk = np.zeros(32000, np.float32)

    async def drive():
        await backend.transcribe(chunk, opts, language="en", uid="u",
                                 window_anchor_s=0.0)
        assert tuple(captured[0].prefix_tokens) == ()
        await backend.transcribe(chunk, opts, language="en", uid="u",
                                 window_anchor_s=0.0)
        # 30 raw tokens -> trim last 4 -> 26-token prefix
        assert tuple(captured[1].prefix_tokens) == tuple([7] * 26)
        await backend.transcribe(chunk, opts, language="en", uid="u",
                                 window_anchor_s=5.0)  # commit moved anchor
        assert tuple(captured[2].prefix_tokens) == ()

    asyncio.run(drive())


def test_backend_incremental_end_to_end(engine, rng):
    """TpuBackend + real ContinuousScheduler: window 2 at the same anchor
    rides the window-1 hypothesis as its forced prefix and the result
    stream extends it."""
    import asyncio
    from types import SimpleNamespace

    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.session import SessionOptions

    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=64, ring=64)
    sched.start()
    submitted = []
    orig_submit = sched.submit
    sched.submit = lambda req: (submitted.append(req), orig_submit(req))[1]
    try:
        class GatelessBackend(TpuBackend):
            # random weights always fail the quality gates, which would
            # (correctly) drop the prefix on retry; emulate trained-weight
            # behavior so the prefix survives to the result
            def _adjust_options(self, topts, chunk):
                import dataclasses

                return dataclasses.replace(
                    topts, temperatures=(0.0,), log_prob_threshold=None,
                    compression_ratio_threshold=None, no_speech_threshold=None,
                )

        backend = GatelessBackend(SimpleNamespace(engine=engine),
                                  continuous_scheduler=sched)
        opts = SessionOptions(language="en", use_vad=False)
        a1 = _audio(rng, 2.0)
        a2 = np.concatenate([a1, _audio(rng, 1.0)])

        async def drive():
            r1 = await backend.transcribe(a1, opts, language="en", uid="u",
                                          window_anchor_s=0.0)
            assert r1.raw_tokens
            assert tuple(submitted[0].prefix_tokens) == ()
            r2 = await backend.transcribe(a2, opts, language="en", uid="u",
                                          window_anchor_s=0.0)
            pre = tuple(submitted[1].prefix_tokens)
            assert pre == backend._trim_prefix(r1.raw_tokens)
            assert len(pre) >= 8
            assert tuple(r2.raw_tokens[: len(pre)]) == pre
            # a commit moves the anchor: next window decodes from scratch
            await backend.transcribe(a2, opts, language="en", uid="u",
                                     window_anchor_s=1.5)
            assert tuple(submitted[2].prefix_tokens) == ()

        asyncio.run(drive())
    finally:
        sched.submit = orig_submit
        sched.stop()


def test_word_timestamps_on_continuous_path(engine, rng):
    """Word alignment against the slot-resident cross-KV must match the
    window path's alignment for the same tokens (cross_ctx pinned to full
    context so the attention content is identical), and a word_timestamps
    request must ride the continuous scheduler end-to-end."""
    import dataclasses

    cb = ContinuousEngine(engine, n_slots=2, prompt_pad=16, ring=64,
                          steps_per_chunk=4, cross_ctx=1500)
    cb.init_state()
    a = _audio(rng, 3.0)
    buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    buf[0, : len(a)] = a
    p, s = engine.build_prompt(OPTS, language="en")
    cb.insert(buf, [p], [s], [True], [0], [0.0], [True], [1.0], [16])
    toks = _run_slot(cb, 0, 0, None)
    assert any(t < engine.spec.eot for t in toks)

    w_cont = engine.align_words(cb.state["cross_kv"], 0, toks, 300)
    _, cross = engine.prepare(buf)
    w_win = engine.align_words(cross, 0, toks, 300)
    assert [w.word for w in w_cont] == [w.word for w in w_win]
    for a_t, b_t in zip(w_cont, w_win):
        assert a_t.start == pytest.approx(b_t.start, abs=1e-3)
        assert a_t.end == pytest.approx(b_t.end, abs=1e-3)

    # end-to-end: the scheduler routes word_timestamps requests and the
    # harvest-time alignment runs against the capped default state
    opts = dataclasses.replace(OPTS, word_timestamps=True)
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        req = BatchRequest(audio=a, options=opts, uid="wt")
        r = sched.submit(req).result(timeout=300)
        assert r.duration == pytest.approx(3.0)
        for seg in r.segments:
            assert seg.words is not None
    finally:
        sched.stop()


def test_backend_routes_word_timestamps_to_continuous():
    from types import SimpleNamespace

    from whisperlive_tpu.serving.backends import TpuBackend

    class _Cont:
        max_window_s = 12.8

    backend = TpuBackend(SimpleNamespace(), continuous_scheduler=_Cont())
    topts = TranscribeOptions(word_timestamps=True)
    assert backend._pick_scheduler(topts, 5.0) is backend.continuous_scheduler
    assert backend._pick_scheduler(
        TranscribeOptions(beam_size=4), 5.0
    ) is backend.scheduler


def test_continuous_scheduler_under_tp(rng):
    """The continuous decode loop must produce identical token streams with
    Megatron-TP-sharded params (the --tp serving path) as unsharded — the
    persistent slot state composes with NamedSharding params under one
    mesh (multichip serving story: session layer feeds a sharded engine)."""
    from whisperlive_tpu.parallel.mesh import EngineShardings

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, 0)
    audio = (np.random.default_rng(11).standard_normal(32000) * 0.1).astype(np.float32)

    def decode(engine):
        sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                    prompt_pad=16, ring=64)
        sched.start()
        try:
            req = BatchRequest(audio=audio, options=OPTS, uid="tp")
            return sched.submit(req).result(timeout=300).raw_tokens
        finally:
            sched.stop()

    base = decode(WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                                batch_buckets=(1, 2)))
    sharded = decode(WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                                   batch_buckets=(1, 2),
                                   shardings=EngineShardings.create(tp=2)))
    assert tuple(base) == tuple(sharded)


def test_small_max_new_tokens_respected(engine, rng):
    """A small explicit generation budget must not be inflated by the
    prefix sampling floor (which applies only to prefix continuations)."""
    import dataclasses

    opts = dataclasses.replace(OPTS, max_new_tokens=4)
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="small")
        r = sched.submit(req).result(timeout=180)
        assert len(r.raw_tokens) <= 4
    finally:
        sched.stop()


def test_prefix_refresh_bounds_lockin():
    """Every Nth consecutive prefix window decodes from scratch, bounding
    how long a plausible-but-wrong carried hypothesis can survive."""
    import asyncio
    from types import SimpleNamespace

    from whisperlive_tpu.engine.scheduler import BatchResult
    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.session import SessionOptions

    captured = []

    class _Cont:
        max_window_s = 12.8

        def submit(self, req):
            captured.append(req)
            req.future.set_result(
                BatchResult(segments=[], language="en", language_prob=1.0,
                            duration=2.0, advance_s=2.0,
                            raw_tokens=tuple([9] * 30))
            )
            return req.future

    backend = TpuBackend(
        SimpleNamespace(engine=SimpleNamespace(spec=SimpleNamespace(eot=50257))),
        continuous_scheduler=_Cont(),
    )
    backend.prefix_refresh = 3
    opts = SessionOptions(language="en", use_vad=False)
    chunk = np.zeros(32000, np.float32)

    async def drive():
        for _ in range(8):
            await backend.transcribe(chunk, opts, language="en", uid="u",
                                     window_anchor_s=0.0)

    asyncio.run(drive())
    used = [bool(r.prefix_tokens) for r in captured]
    # call 0: cold. calls 1-3: prefix streak. call 4: forced refresh.
    # calls 5-7: streak again.
    assert used == [False, True, True, True, False, True, True, True]


def test_insert_failure_fails_taken_futures(engine, rng):
    """Requests popped from _pending must get their futures failed if the
    insert itself blows up — they are invisible to the worker-loop
    catch-all at that point."""
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)

    def boom(take, free, enc_ctx=None):
        raise RuntimeError("induced insert failure")

    sched._insert_take = boom
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=OPTS, uid="boom")
        with pytest.raises(RuntimeError, match="induced insert failure"):
            sched.submit(req).result(timeout=30)
    finally:
        sched.stop()


def test_scheduler_restart_recreates_assemble_pool(engine, rng):
    """stop() then start() is a supported cycle: the word-timestamps
    assemble pool must be recreated, not left shut down."""
    import dataclasses

    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    sched.stop()
    sched.start()
    try:
        opts = dataclasses.replace(OPTS, word_timestamps=True)
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="restart")
        r = sched.submit(req).result(timeout=180)
        assert r.duration == pytest.approx(2.0)
    finally:
        sched.stop()


def test_implicated_prefix_evicted_from_cache():
    """A prefix-eligible result with empty raw_tokens (gate failure /
    no-speech) must also EVICT the previous cache entry — re-forcing the
    hypothesis that just got implicated repeats the doomed cycle."""
    import asyncio
    from types import SimpleNamespace

    from whisperlive_tpu.engine.scheduler import BatchResult
    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.session import SessionOptions

    calls = [0]

    class _Cont:
        max_window_s = 12.8

        def submit(self, req):
            calls[0] += 1
            raw = tuple([7] * 30) if calls[0] == 1 else ()
            req.future.set_result(
                BatchResult(segments=[], language="en", language_prob=1.0,
                            duration=2.0, advance_s=2.0, raw_tokens=raw)
            )
            return req.future

    backend = TpuBackend(
        SimpleNamespace(engine=SimpleNamespace(spec=SimpleNamespace(eot=50257))),
        continuous_scheduler=_Cont(),
    )
    opts = SessionOptions(language="en", use_vad=False)
    chunk = np.zeros(32000, np.float32)

    async def drive():
        await backend.transcribe(chunk, opts, language="en", uid="u",
                                 window_anchor_s=0.0)
        assert "u" in backend._prefix_cache
        await backend.transcribe(chunk, opts, language="en", uid="u",
                                 window_anchor_s=0.0)  # raw=() -> evict
        assert "u" not in backend._prefix_cache

    asyncio.run(drive())


def test_session_loop_drives_prefix_via_anchor(engine, rng):
    """The live session loop (ServeClient.speech_to_text) passes the tail
    anchor into the backend, so growing audio at a stable anchor engages
    the incremental-prefix cache — the full serving-side plumbing, not
    just the backend API."""
    import asyncio
    from types import SimpleNamespace

    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.server import ServeClient
    from whisperlive_tpu.serving.session import SessionOptions

    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=64, ring=64)
    sched.start()
    captured = []
    orig_submit = sched.submit
    sched.submit = lambda req: (captured.append(req), orig_submit(req))[1]
    try:
        class GatelessBackend(TpuBackend):
            def _adjust_options(self, topts, chunk):
                import dataclasses

                return dataclasses.replace(
                    topts, temperatures=(0.0,), log_prob_threshold=None,
                    compression_ratio_threshold=None,
                    no_speech_threshold=None, max_new_tokens=16,
                )

        backend = GatelessBackend(SimpleNamespace(engine=engine),
                                  continuous_scheduler=sched)

        async def drive():
            client = ServeClient(
                websocket=None, uid="plumb",
                options=SessionOptions(language="en", use_vad=False,
                                       same_output_threshold=99),
                backend=backend,
                send_json=lambda payload: None,
            )
            client.add_frames(_audio(rng, 2.0))
            client.start()
            try:
                # generous budget: under host contention (parallel suite
                # runs share one core) a decode can take tens of seconds
                for _ in range(600):  # wait for >= 2 decodes
                    await asyncio.sleep(0.1)
                    if len(captured) >= 2:
                        break
                assert len(captured) >= 2
                # first window cold, a later window carries the hypothesis
                assert tuple(captured[0].prefix_tokens) == ()
                assert any(req.prefix_tokens for req in captured[1:])
            finally:
                await client.cleanup()

        asyncio.run(drive())
    finally:
        sched.submit = orig_submit
        sched.stop()


def test_zero_recompiles_after_warmup(engine, rng):
    """Every jitted program on the live continuous path (insert at each
    bucket, step, release at any done-count, align) must be compiled by
    warmup(): a cold compile during serving stalls the shared lockstep
    loop for every stream (CLAUDE.md bucketed-shapes invariant)."""
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=12,
    )
    sched = ContinuousScheduler(engine, n_slots=4, steps_per_chunk=2,
                                prompt_pad=64, ring=64)
    sched.warmup()
    cb = sched.cb
    tracked = {
        "insert": cb._insert_fn,
        "step": cb._step_fn,
        "release": cb._release_fn,
        "align": engine._align_fn,
    }
    before = {k: f._cache_size() for k, f in tracked.items()}

    sched.start()
    try:
        # batch churn: 1, then 3 concurrent, then 4 (insert buckets 1/2/4),
        # mixed with a word-timestamps request (align at harvest) — every
        # release count 1..4 can occur
        for wave in ([2.0], [1.5, 2.0, 2.5], [1.0, 1.5, 2.0, 2.5]):
            futs = []
            for i, sec in enumerate(wave):
                o = opts if i else dataclasses_replace_wt(opts)
                req = BatchRequest(audio=_audio(rng, sec), options=o,
                                   uid=f"w{len(wave)}-{i}")
                futs.append(sched.submit(req))
            for f in futs:
                f.result(timeout=180)
    finally:
        sched.stop()

    after = {k: f._cache_size() for k, f in tracked.items()}
    assert after == before, f"recompiled after warmup: {before} -> {after}"


def dataclasses_replace_wt(opts):
    import dataclasses

    return dataclasses.replace(opts, word_timestamps=True)


def test_reduced_context_insert_token_consistency(engine, rng):
    """A window inserted at a reduced encoder-context bucket (enc_ctx=512,
    cross region masked beyond it) must decode token-exactly like a plain
    lockstep decode over a cross-KV built from the same short encode — the
    per-slot cross_len mask fully hides the stale region tail."""
    import jax
    from whisperlive_tpu.models import whisper as wmod

    enc_ctx = 512
    cb = ContinuousEngine(engine, n_slots=2, prompt_pad=16, ring=64,
                          steps_per_chunk=4, cross_ctx=640)
    cb.init_state()
    # poison the cross region so an unmasked stale tail would change tokens
    cb.state["cross_kv"] = jax.tree.map(
        lambda a: jnp.ones_like(a) if a is not None else a,
        cb.state["cross_kv"],
    )
    audio = _audio(rng, 3.0)
    p, s = engine.build_prompt(OPTS, language="en")
    cb.insert(np.stack([audio]), [p], [s], [True], [0], [0.0], [True],
              [1.0], [20], enc_ctx=enc_ctx)
    status = None
    for _ in range(50):
        status = cb.step()
        if status[0, 1] > 0.5:
            break
    toks = cb.harvest(0, 0, int(status[0, 2]))
    strip = lambda ts: [int(t) for t in ts if t != engine.spec.eot]

    # reference: the same short-context encode -> cross-KV -> plain decode
    n_samples = enc_ctx * 2 * mel_ops.HOP_LENGTH
    buf = np.zeros((1, n_samples), np.float32)
    buf[0, : len(audio)] = audio[:n_samples]
    mel = mel_ops.log_mel_spectrogram(jnp.asarray(buf), n_mels=engine.cfg.n_mels)
    enc = wmod.encode(engine.params, engine.cfg, mel)
    cross = wmod.compute_cross_kv(engine.params, engine.cfg, enc)
    (ref,) = engine.decode_batch(cross, [p], [s], OPTS)
    assert strip(toks) == [int(t) for t in ref.tokens][: len(strip(toks))]
    assert len(strip(toks)) > 0


def test_fair_slot_grant_lru_uid(engine, rng):
    """With one slot and a backlog from stream A, a later request from
    stream B must be served before A's backlog drains: slots are granted
    least-recently-served-uid first, so re-submitting streams cannot
    starve newcomers at oversubscription."""
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    done_order = []

    def tag(f, name):
        f.add_done_callback(lambda _: done_order.append(name))

    sched.start()
    try:
        a_futs = []
        for i in range(4):
            req = BatchRequest(audio=_audio(rng, 2.0), options=OPTS,
                               uid="A")
            a_futs.append(sched.submit(req))
            tag(a_futs[-1], f"A{i}")
        time.sleep(0.3)  # let A0 occupy the slot; A1..A3 queue
        req_b = BatchRequest(audio=_audio(rng, 2.0), options=OPTS, uid="B")
        fb = sched.submit(req_b)
        tag(fb, "B")
        fb.result(timeout=180)
        for f in a_futs:
            f.result(timeout=180)
        # B beats at least A's tail: it must not be served last
        assert done_order.index("B") < done_order.index("A3")
    finally:
        sched.stop()


def test_overload_backpressure_signal(engine):
    """Sustained oversubscription trips overloaded(); an idle scheduler
    does not."""
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    assert not sched.overloaded()
    sched._load_ema = 5.0
    assert sched.overloaded()
    assert sched.overloaded(bound=4.9)
    assert not sched.overloaded(bound=6.0)
    sched._pending = [(None, 0)] * 8
    sched._service_ema = 2.0
    assert sched.estimated_wait_s() == pytest.approx(8 * 2.0 / 2)


def test_continuous_beam_token_parity(engine, rng):
    """A slot's K lockstep lanes at T=0 must reproduce the window path's
    batched beam search (engine._decode_beam) token for token — beam
    serving keeps continuous batching without changing decode semantics."""
    K = 3
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=16, beam_size=K,
    )
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64, beam_width=K,
                                cross_ctx=1500)
    sched.start()
    try:
        audio = _audio(rng, 3.0)
        req = BatchRequest(audio=audio, options=opts, uid="beam")
        r = sched.submit(req).result(timeout=180)
        cont = [int(t) for t in r.raw_tokens]
    finally:
        sched.stop()

    buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    buf[0, : len(audio)] = audio
    _, cross = engine.prepare(buf)
    p, s = engine.build_prompt(opts, language="en")
    (ref,) = engine.decode_batch(cross, [p], [s], opts)
    assert cont == [int(t) for t in ref.tokens]
    assert len(cont) > 0


def test_continuous_beam_two_slots_and_reuse(engine, rng):
    """Two beamed slots decode concurrently and a released slot's lanes
    serve a new request cleanly."""
    K = 2
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=12, beam_size=K,
    )
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=16, ring=64, beam_width=K,
                                cross_ctx=1500)
    sched.start()
    try:
        audios = [_audio(rng, 2.0), _audio(rng, 3.0), _audio(rng, 2.5)]
        futs = [
            sched.submit(BatchRequest(audio=a, options=opts, uid=f"b{i}"))
            for i, a in enumerate(audios)
        ]
        results = [f.result(timeout=180) for f in futs]
    finally:
        sched.stop()
    for a, r in zip(audios, results):
        buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
        buf[0, : len(a)] = a
        _, cross = engine.prepare(buf)
        p, s = engine.build_prompt(opts, language="en")
        (ref,) = engine.decode_batch(cross, [p], [s], opts)
        assert [int(t) for t in r.raw_tokens] == [int(t) for t in ref.tokens]


def test_continuous_beam_sampling_retry_best_of(engine, rng):
    """A beamed request that fails the gates retries at T>0: the K lanes
    sample independently (best_of) and the harvest keeps the best lane —
    the request resolves with the retry temperature."""
    K = 2
    opts = TranscribeOptions(
        language="en", temperatures=(0.0, 0.8),
        log_prob_threshold=0.0,  # always fails -> forced retry at 0.8
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=40, beam_size=K,
    )
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64, beam_width=K,
                                cross_ctx=1500)
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="bo")
        r = sched.submit(req).result(timeout=180)
        if r.segments:
            assert r.segments[0].temperature == pytest.approx(0.8)
    finally:
        sched.stop()


def test_continuous_scheduler_dp_x_tp_parity(rng):
    """dp x tp serving: with the slot pool sized as a multiple of dp, the
    slot state's row axis shards over the "data" mesh axis (each replica
    decodes its own slots; TP collectives ride "model") and token streams
    must match the unsharded engine exactly. This is the serving-layer
    multi-chip scale-out: one scheduler drives dp x the slots."""
    from whisperlive_tpu.parallel.mesh import EngineShardings

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, 0)
    audios = [
        (np.random.default_rng(20 + i).standard_normal(32000) * 0.1).astype(
            np.float32
        )
        for i in range(4)
    ]

    def decode(engine, n_slots):
        sched = ContinuousScheduler(engine, n_slots=n_slots,
                                    steps_per_chunk=4, prompt_pad=16,
                                    ring=64)
        sched.start()
        try:
            futs = [
                sched.submit(BatchRequest(audio=a, options=OPTS,
                                          uid=f"dp{i}"))
                for i, a in enumerate(audios)
            ]
            return [tuple(f.result(timeout=300).raw_tokens) for f in futs]
        finally:
            sched.stop()

    base = decode(
        WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                      batch_buckets=(1, 2)),
        n_slots=4,
    )
    shardings = EngineShardings.create(tp=2)  # 8 devices -> dp=4 x tp=2
    eng = WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                        batch_buckets=(1, 2), shardings=shardings)
    sched = ContinuousScheduler(eng, n_slots=4, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    assert sched.cb.dp_sharded, "4 slots over dp=4 must shard"
    sched.start()
    try:
        futs = [
            sched.submit(BatchRequest(audio=a, options=OPTS, uid=f"dp{i}"))
            for i, a in enumerate(audios)
        ]
        sharded = [tuple(f.result(timeout=300).raw_tokens) for f in futs]
    finally:
        sched.stop()
    assert base == sharded
    assert any(len(t) > 0 for t in base)


def test_ring_wrap_preserves_finished_hypothesis(engine, rng):
    """A slot that decodes to the ring cap and then idles (finished,
    awaiting harvest) must keep its FULL hypothesis: once gstep wraps,
    the uniform ring column lands back inside the finished slot's tokens
    and the write must preserve, not overwrite with EOT. (Live at
    ring=128 defaults: a token-dense window can hit gen_len = ring-1.)"""
    ring = 16
    cb = ContinuousEngine(engine, n_slots=2, prompt_pad=16, ring=ring,
                          steps_per_chunk=4, cross_ctx=1500)
    cb.init_state()
    p, s = engine.build_prompt(OPTS, language="en")
    a = _audio(rng, 3.0)
    b = _audio(rng, 2.0)
    # slot 0: budget ring-1 (hits the cap); slot 1 joins later and keeps
    # the loop stepping past the wrap while slot 0 idles finished
    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0],
              [ring - 1])
    status = cb.step()
    cb.insert(np.stack([b]), [p], [s], [True], [1], [0.0], [True], [1.0],
              [ring - 1])
    for _ in range(12):  # gstep advances well past ring
        status = cb.step()
        if status[0, 1] > 0.5 and status[1, 1] > 0.5:
            pass  # keep stepping anyway: the wrap is the point
    assert status[0, 1] > 0.5
    gen = int(status[0, 2])
    assert gen == ring - 1
    toks = [int(t) for t in cb.harvest(0, 0, gen)
            if t != engine.spec.eot]
    ref = _lockstep_tokens(engine, a, ring - 1)[: ring - 1]
    # no EOT holes: the leading tokens survive the ring wrap intact
    assert toks == [t for t in ref if t != engine.spec.eot][: len(toks)]
    assert len(toks) >= ring - 2


def test_late_bound_audio_refresh(engine, rng):
    """A request that queues behind a full slot pool decodes its stream's
    CURRENT tail — re-snapshotted once at slot-grant time via
    req.refresh_audio — not the stale submit-time snapshot; the result's
    duration and audio_bound_at reflect the refreshed window."""
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        f0 = sched.submit(
            BatchRequest(audio=_audio(rng, 2.0), options=OPTS, uid="a")
        )
        stale, fresh = _audio(rng, 1.0), _audio(rng, 3.0)
        calls = []

        def refresh():
            calls.append(time.monotonic())
            return fresh

        req = BatchRequest(audio=stale, options=OPTS, uid="b",
                           refresh_audio=refresh)
        t_submit = req.submitted_at
        f1 = sched.submit(req)
        f0.result(timeout=180)
        r = f1.result(timeout=180)
        assert calls and len(calls) == 1
        assert req.audio_rebound
        assert r.duration == pytest.approx(len(fresh) / 16000)
        assert r.audio_bound_at >= t_submit
    finally:
        sched.stop()


def test_refresh_one_shot_across_gate_retries(engine, rng):
    """Gate-retry re-inserts must re-decode the SAME window their first
    attempt decoded (temperature-ladder semantics): the audio refresh
    fires once, and the retried result keeps the refreshed-once window."""
    opts = TranscribeOptions(
        language="en", temperatures=(0.0, 0.9),
        log_prob_threshold=0.0,  # unreachable: every decode "fails"
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        fresh = _audio(rng, 2.5)
        calls = []

        def refresh():
            calls.append(1)
            return fresh

        req = BatchRequest(audio=_audio(rng, 1.0), options=opts,
                           uid="retry", refresh_audio=refresh)
        r = sched.submit(req).result(timeout=180)
        assert len(calls) == 1
        assert r.duration == pytest.approx(len(fresh) / 16000)
        if r.segments:
            assert r.segments[0].temperature == pytest.approx(0.9)
    finally:
        sched.stop()


def test_refresh_shorter_or_none_keeps_snapshot(engine, rng):
    """A refresh returning None (anchor moved) or a shorter array keeps
    the submit-time snapshot."""
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        snap = _audio(rng, 2.0)
        req = BatchRequest(audio=snap, options=OPTS, uid="n",
                           refresh_audio=lambda: None)
        r = sched.submit(req).result(timeout=180)
        assert r.duration == pytest.approx(len(snap) / 16000)
        req2 = BatchRequest(audio=snap, options=OPTS, uid="s",
                            refresh_audio=lambda: snap[:8000])
        r2 = sched.submit(req2).result(timeout=180)
        assert r2.duration == pytest.approx(len(snap) / 16000)
    finally:
        sched.stop()


def test_randomized_schedule_soak(engine, rng):
    """Randomized arrival timing, lengths, budgets, prefixes and beams of
    requests against one live scheduler: EVERY future must resolve, no
    slot may leak, and the worker must stay alive — the liveness
    invariants that hold regardless of schedule shape."""
    import dataclasses

    sched = ContinuousScheduler(engine, n_slots=3, steps_per_chunk=4,
                                prompt_pad=16, ring=64)
    sched.start()
    try:
        futs = []
        for i in range(14):
            secs = float(rng.uniform(1.2, 6.0))
            opts = dataclasses.replace(
                OPTS, max_new_tokens=int(rng.integers(4, 18))
            )
            req = BatchRequest(
                audio=_audio(rng, secs), options=opts,
                uid=f"soak{int(rng.integers(0, 5))}",  # uids collide
            )
            if i % 4 == 1:
                # carried-hypothesis continuation joins mid-decode
                req.prefix_tokens = [engine.spec.timestamp_begin, 300, 301]
            futs.append(sched.submit(req))
            time.sleep(float(rng.uniform(0.0, 0.15)))
        for f in futs:
            r = f.result(timeout=300)  # resolves — no lost request
            assert r is not None
        deadline = time.time() + 30
        while sched._slots and time.time() < deadline:
            time.sleep(0.1)
        assert not sched._slots, f"leaked slots: {list(sched._slots)}"
        assert sched._thread is not None and sched._thread.is_alive()
    finally:
        sched.stop()


def test_custom_suppress_routes_to_window_scheduler():
    """The continuous step program bakes ONE suppress mask — requests with
    a different suppress config must take the window path."""
    from whisperlive_tpu.serving.backends import TpuBackend

    class StubCont:
        beam_width = 1
        suppress_key = ((-1,), True)  # the defaults

    backend = TpuBackend(scheduler="WINDOW", continuous_scheduler=StubCont())
    assert backend._pick_scheduler(OPTS) is backend.continuous_scheduler
    custom = dataclasses.replace(OPTS, suppress_tokens=(5, 7))
    assert backend._pick_scheduler(custom) == "WINDOW"
    noblank = dataclasses.replace(OPTS, suppress_blank=False)
    assert backend._pick_scheduler(noblank) == "WINDOW"


def test_oversized_initial_prompt_keeps_sot_anchor(engine, rng):
    """A huge initial_prompt must degrade by dropping HEAD conditioning
    tokens — the sot sequence must survive and the request must resolve
    (tail-truncation used to cut <|sot|> and leave sot_idx out of range)."""
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=4,
                                prompt_pad=32, ring=64)
    # huge conditioning: far beyond prompt_pad=32
    big_prompt = " ".join(f"word{i}" for i in range(400))
    opts = dataclasses.replace(OPTS, initial_prompt=big_prompt,
                               max_new_tokens=8)
    sot_seq = engine.tokenizer.sot_sequence()
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="big",
                           language="en")
        r = req.future
        sched.submit(req)
        result = r.result(timeout=180)
        assert result is not None
    finally:
        sched.stop()
    # and the overflow rebuild itself preserves the anchor: rebuild the
    # prompt the way _insert_take does and check the invariants directly
    p, s = engine.build_prompt(opts, language="en")
    assert len(p) > 32  # the scenario is real
    keep = max(32 - (len(p) - 0) - 1, 0)
    p2, s2 = engine.build_prompt(opts, previous_tokens=(), language="en")
    if len(p2) > 32:
        drop = min(len(p2) - 32, s2)
        p2 = p2[drop:][:32]
        s2 -= drop
    assert 0 <= s2 < len(p2)
    assert p2[s2] == sot_seq[0]  # <|sot|> anchor intact
