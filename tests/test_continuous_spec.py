"""Speculative continuous batching (engine/continuous.py spec mode).

The exactness contract mirrors engine/speculative.py's: at temperature 0
the committed token stream is IDENTICAL to the plain continuous path (and
hence to a fresh lockstep decode) for ANY draft — a never-agreeing draft
changes only how many tokens commit per round, never which tokens.

No reference counterpart: faster-whisper/CTranslate2 has no speculative
decoding; the behavior bar is this engine's own greedy decode, which is
parity-tested against HF (tests/test_whisper_model.py).
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.engine.continuous import ContinuousEngine, ContinuousScheduler
from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.scheduler import BatchRequest
from whisperlive_tpu.models.whisper import WhisperConfig, init_params
from whisperlive_tpu.ops import mel as mel_ops

CFG = dict(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def engine():
    cfg = WhisperConfig(**CFG)
    return WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32, batch_buckets=(1, 2)
    )


@pytest.fixture(scope="module")
def distil_draft():
    """Distil-shaped draft: shared encoder geometry, fewer decoder layers,
    DIFFERENT random weights — a plausible mid-quality draft."""
    cfg = WhisperConfig(**{**CFG, "n_text_layer": 1})
    return WhisperEngine(
        cfg, init_params(cfg, 7), compute_dtype=jnp.float32, batch_buckets=(1,)
    )


OPTS = TranscribeOptions(
    language="en", temperatures=(0.0,), log_prob_threshold=None,
    no_speech_threshold=None, compression_ratio_threshold=None,
    max_new_tokens=20,
)


def _audio(rng, seconds):
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def _lockstep_tokens(eng, audio, max_new=20):
    buf = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    buf[0, : len(audio)] = audio
    _, cross = eng.prepare(buf)
    p, s = eng.build_prompt(OPTS, language="en")
    opts = TranscribeOptions(**{**OPTS.__dict__, "max_new_tokens": max_new})
    (res,) = eng.decode_with_fallback(cross, [p], [s], opts)
    return [int(t) for t in res.tokens]


def _run_to_done(cb, slots):
    """Step until every slot in `slots` reports all-lanes-finished."""
    for _ in range(200):
        status = cb.step()
        if all(status[s, 1] > 0.5 for s in slots):
            return status
    raise AssertionError("slots never finished")


def _strip(eng, toks):
    return [int(t) for t in toks if t != eng.spec.eot]


@pytest.mark.parametrize("draft_kind", ["self", "distil"])
def test_spec_token_parity_any_draft(engine, distil_draft, rng, draft_kind):
    """Greedy output must be token-exact vs a fresh lockstep decode with
    BOTH a perfect draft (the target itself: near-full acceptance) and an
    unrelated one (random distil weights: near-zero acceptance)."""
    draft = engine if draft_kind == "self" else distil_draft
    # ring sized so the spec round budget (ring // (k+2) rounds, >= 1
    # committed token each) cannot bind before max_new=20 tokens even at
    # zero acceptance
    cb = ContinuousEngine(engine, n_slots=1, prompt_pad=16, ring=128,
                          steps_per_chunk=2, cross_ctx=1500,
                          draft_engine=draft, spec_k=3)
    assert cb.ring % (cb.spec_k + 2) == 0
    cb.init_state()
    a = _audio(rng, 3.0)
    p, s = engine.build_prompt(OPTS, language="en")
    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    status = _run_to_done(cb, [0])
    gen = int(status[0, 2])
    toks = cb.harvest(0, 0, gen)
    # committed-token mask bookkeeping: one valid ring column per token
    assert len(toks) == gen
    assert _strip(engine, toks) == _lockstep_tokens(engine, a)[:20]


def test_spec_midflight_join_and_slot_reuse(engine, rng):
    """Item B joins while item A is mid-round; both match their fresh
    lockstep decodes; a released slot is reusable (mask fully re-armed)."""
    cb = ContinuousEngine(engine, n_slots=2, prompt_pad=16, ring=64,
                          steps_per_chunk=1, cross_ctx=1500,
                          draft_engine=engine, spec_k=3)
    cb.init_state()
    a, b, c = _audio(rng, 3.0), _audio(rng, 2.0), _audio(rng, 4.0)
    p, s = engine.build_prompt(OPTS, language="en")
    gstep = 0

    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    cb.step()
    gstep += cb.gstep_per_chunk
    join_b = gstep
    cb.insert(np.stack([b]), [p], [s], [True], [1], [0.0], [True], [1.0], [20])
    for _ in range(100):
        status = cb.step()
        gstep += cb.gstep_per_chunk
        if status[0, 1] > 0.5 and status[1, 1] > 0.5:
            break
    toks_a = cb.harvest(0, 0, int(status[0, 2]))
    toks_b = cb.harvest(1, join_b, int(status[1, 2]))
    assert _strip(engine, toks_a) == _lockstep_tokens(engine, a)[:20]
    assert _strip(engine, toks_b) == _lockstep_tokens(engine, b)[:20]

    cb.release([0, 1])
    join_c = gstep
    cb.insert(np.stack([c]), [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    status = _run_to_done(cb, [0])
    toks_c = cb.harvest(0, join_c, int(status[0, 2]))
    assert _strip(engine, toks_c) == _lockstep_tokens(engine, c)[:20]


def test_spec_self_draft_accepts(engine, rng):
    """A perfect draft must actually accelerate: the slot commits multiple
    tokens per round, finishing in far fewer rounds than tokens."""
    cb = ContinuousEngine(engine, n_slots=1, prompt_pad=16, ring=64,
                          steps_per_chunk=1, cross_ctx=1500,
                          draft_engine=engine, spec_k=3)
    cb.init_state()
    a = _audio(rng, 3.0)
    p, s = engine.build_prompt(OPTS, language="en")
    cb.insert(np.stack([a]), [p], [s], [True], [0], [0.0], [True], [1.0], [20])
    rounds = 0
    for _ in range(200):
        status = cb.step()
        rounds += 1
        if status[0, 1] > 0.5:
            break
    gen = int(status[0, 2])
    # self-draft: every proposal agrees, so each round commits ~k+1 tokens
    assert gen >= 20 or rounds <= max(2, gen)  # sanity on tiny decodes
    assert rounds < gen, f"no acceleration: {rounds} rounds for {gen} tokens"


def test_spec_scheduler_end_to_end(engine, distil_draft, rng):
    """Full scheduler path (queueing, harvest, futures) over spec rounds;
    results must match the plain continuous scheduler's."""
    plain = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=2,
                                prompt_pad=16, ring=64)
    spec = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=2,
                               prompt_pad=16, ring=160,
                               draft_engine=distil_draft, spec_k=3)
    audios = [_audio(rng, 2.0 + 0.5 * i) for i in range(3)]

    def run(sched):
        sched.start()
        try:
            futs = [
                sched.submit(BatchRequest(audio=a, options=OPTS, uid=f"u{i}"))
                for i, a in enumerate(audios)
            ]
            return [f.result(timeout=300) for f in futs]
        finally:
            sched.stop()

    r_plain = run(plain)
    r_spec = run(spec)
    for rp, rs in zip(r_plain, r_spec):
        tp = [seg.text for seg in rp.segments]
        ts = [seg.text for seg in rs.segments]
        assert tp == ts
        assert rp.language == rs.language


def test_spec_prefix_continuation_parity(engine, rng):
    """Incremental partial decoding rides spec rounds: a carried
    hypothesis prefix continues token-exactly vs the plain path."""
    a = _audio(rng, 3.0)
    full = _lockstep_tokens(engine, a)[:20]
    if len(full) < 6:
        pytest.skip("decode too short to split")
    prefix, want_tail = full[:4], full[4:]

    cb = ContinuousEngine(engine, n_slots=1, prompt_pad=32, ring=64,
                          steps_per_chunk=2, cross_ctx=1500,
                          draft_engine=engine, spec_k=3)
    cb.init_state()
    p, s = engine.build_prompt(OPTS, language="en")
    ts_begin = engine.spec.timestamp_begin
    lts = next((t for t in reversed(prefix) if t >= ts_begin), ts_begin - 1)
    cb.insert(
        np.stack([a]), [p + prefix], [s], [True], [0], [0.0], [True], [1.0],
        [16], last_ts=[lts], has_prefix=[True],
        pfx_last_ts=[prefix[-1] >= ts_begin],
        pfx_penult_ts=[len(prefix) < 2 or prefix[-2] >= ts_begin],
    )
    status = _run_to_done(cb, [0])
    toks = cb.harvest(0, 0, int(status[0, 2]))
    assert _strip(engine, toks) == want_tail


def test_spec_zero_recompiles_after_warmup(engine, distil_draft, rng):
    """The spec-mode live path (insert at each bucket incl. draft prefill,
    the verify-round chunk, release) must be fully compiled by warmup():
    a cold compile during serving stalls the shared lockstep loop
    (CLAUDE.md bucketed-shapes invariant)."""
    sched = ContinuousScheduler(engine, n_slots=2, steps_per_chunk=2,
                                prompt_pad=16, ring=120,
                                draft_engine=distil_draft, spec_k=3)
    sched.warmup()
    cb = sched.cb
    tracked = {
        "insert": cb._insert_fn,
        "spec_step": cb._spec_fn,
        "release": cb._release_fn,
    }
    before = {k: f._cache_size() for k, f in tracked.items()}
    sched.start()
    try:
        for wave in ([2.0], [1.5, 2.5]):
            futs = [
                sched.submit(BatchRequest(audio=_audio(rng, sec),
                                          options=OPTS, uid=f"z{i}"))
                for i, sec in enumerate(wave)
            ]
            for f in futs:
                f.result(timeout=300)
    finally:
        sched.stop()
    after = {k: f._cache_size() for k, f in tracked.items()}
    assert after == before, f"recompiled after warmup: {before} -> {after}"


def test_spec_temperature_retry_progresses(engine, distil_draft, rng):
    """T>0 fallback retries ride spec rounds too (one committed token per
    round when nothing is accepted) and still terminate."""
    opts = TranscribeOptions(
        language="en", temperatures=(0.0, 0.9),
        log_prob_threshold=0.0,  # unreachable: every decode "fails"
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=2,
                                prompt_pad=16, ring=64,
                                draft_engine=distil_draft, spec_k=3)
    sched.start()
    try:
        req = BatchRequest(audio=_audio(rng, 2.0), options=opts, uid="retry")
        r = sched.submit(req).result(timeout=300)
        if r.segments:
            assert r.segments[0].temperature == pytest.approx(0.9)
    finally:
        sched.stop()


def test_spec_acceptance_stats(engine, distil_draft, rng):
    """Measured-acceptance bookkeeping (spec_stats/acceptance_rate): a
    perfect self-draft scores near 1.0; an unrelated random draft near 0.
    The committed count must equal rounds + accepted by construction."""

    def run(draft):
        sched = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=2,
                                    prompt_pad=16, ring=160,
                                    draft_engine=draft, spec_k=3)
        sched.start()
        try:
            for i in range(2):
                req = BatchRequest(audio=_audio(rng, 2.0 + i), options=OPTS,
                                   uid=f"acc{i}")
                sched.submit(req).result(timeout=300)
        finally:
            sched.stop()
        return sched

    hi = run(engine)  # self-draft: every proposal agrees
    assert hi.spec_stats["windows"] == 2
    assert hi.spec_stats["committed"] >= hi.spec_stats["rounds"]
    assert hi.acceptance_rate() > 0.7, hi.spec_stats

    lo = run(distil_draft)  # unrelated weights: near-zero agreement
    assert lo.spec_stats["windows"] == 2
    assert lo.acceptance_rate() < 0.3, lo.spec_stats
    # plain mode never populates stats
    plain = ContinuousScheduler(engine, n_slots=1, steps_per_chunk=2,
                                prompt_pad=16, ring=64)
    assert plain.acceptance_rate() == 0.0


def test_spec_zero_recompiles_after_warmup(engine, distil_draft, rng):
    """Spec mode's live path (insert buckets, spec round program, release,
    align) must be fully compiled by warmup() — same invariant as the
    plain path's test_zero_recompiles_after_warmup: a cold compile during
    serving stalls the shared lockstep loop for every stream."""
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=10,
    )
    sched = ContinuousScheduler(engine, n_slots=4, steps_per_chunk=2,
                                prompt_pad=64, ring=60,
                                draft_engine=distil_draft, spec_k=3)
    sched.warmup()
    cb = sched.cb
    tracked = {
        "insert": cb._insert_fn,
        "spec": cb._spec_fn,
        "release": cb._release_fn,
        "align": engine._align_fn,
    }
    before = {k: f._cache_size() for k, f in tracked.items()}

    sched.start()
    try:
        for wave in ([2.0], [1.5, 2.0, 2.5], [1.0, 1.5, 2.0, 2.5]):
            futs = []
            for i, sec in enumerate(wave):
                req = BatchRequest(audio=_audio(rng, sec), options=opts,
                                   uid=f"sw{len(wave)}-{i}")
                futs.append(sched.submit(req))
            for f in futs:
                f.result(timeout=180)
    finally:
        sched.stop()

    after = {k: f._cache_size() for k, f in tracked.items()}
    assert after == before, f"recompiled after warmup: {before} -> {after}"
