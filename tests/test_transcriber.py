"""Engine-level transcription on CPU with a tiny random model: the full
pipeline (mel -> encode -> detect -> prompt -> sampling loop -> timestamp
segmentation -> seek loop) must run and produce structurally valid output.
(Text quality needs trained weights; structure doesn't.)"""

import numpy as np
import pytest

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.transcribe import Transcriber, split_segments_by_timestamps
from whisperlive_tpu.models.whisper import WhisperConfig, init_params


@pytest.fixture(scope="module")
def engine():
    import jax.numpy as jnp

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    return WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32, batch_buckets=(1, 2)
    )


def test_transcribe_structure(engine, rng):
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
    opts = TranscribeOptions(
        language="en",
        temperatures=(0.0,),
        log_prob_threshold=None,  # random weights: don't gate
        no_speech_threshold=None,
        compression_ratio_threshold=None,
        max_new_tokens=24,
    )
    segments, info = t.transcribe(audio, opts)
    assert info.language == "en"
    assert info.duration == pytest.approx(5.0)
    for s in segments:
        assert 0.0 <= s.start <= s.end <= 35.0
        assert isinstance(s.text, str)
        assert s.tokens


def test_transcribe_language_detection(engine, rng):
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    opts = TranscribeOptions(
        temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    _, info = t.transcribe(audio, opts)
    assert info.language in engine.tokenizer.spec.language_codes
    assert 0.0 <= info.language_probability <= 1.0


class _Spec:
    timestamp_begin = 1000
    eot = 900


def ts(s):  # timestamp token for s seconds
    return 1000 + int(s / 0.02)


def test_split_segments_single_timestamp_ending_emits_tail():
    # Window output ends on a lone timestamp -> the trailing slice is a
    # finished segment AND the whole window is consumed
    # (transcriber_faster_whisper.py:993-1019: slices.append(len(tokens)),
    # seek += segment_size).
    toks = [ts(0.0), 5, 6, ts(2.0), ts(2.0), 7, ts(4.0)]
    segs, advance, single = split_segments_by_timestamps(_Spec, np.array(toks), 10.0, 30.0, 3000)
    assert len(segs) == 2
    assert segs[0][0] == pytest.approx(10.0)
    assert segs[0][1] == pytest.approx(12.0)
    assert segs[0][2] == [ts(0.0), 5, 6, ts(2.0)]
    assert segs[1][0] == pytest.approx(12.0)
    assert segs[1][1] == pytest.approx(14.0)
    assert segs[1][2] == [ts(2.0), 7, ts(4.0)]
    assert advance == 3000


def test_split_segments_unfinished_tail_dropped_and_rewound():
    # No closing timestamp after the last pair -> trailing tokens are
    # unfinished: NOT emitted now (they'd be re-decoded next window), and
    # seek rewinds to the last closed timestamp
    # (transcriber_faster_whisper.py:1020-1025).
    toks = [ts(0.0), 5, 6, ts(2.0), ts(2.0), 7, 8]
    segs, advance, single = split_segments_by_timestamps(_Spec, np.array(toks), 10.0, 30.0, 3000)
    assert len(segs) == 1
    assert segs[0][2] == [ts(0.0), 5, 6, ts(2.0)]
    # seek advances to the last consecutive pair boundary: 2.0s * 100 frames
    assert advance == 200


def test_split_segments_no_pair_single_segment():
    toks = [ts(0.0), 5, 6, 7]
    segs, advance, single = split_segments_by_timestamps(_Spec, np.array(toks), 0.0, 12.5, 1250)
    assert len(segs) == 1
    assert segs[0][0] == 0.0 and segs[0][1] == pytest.approx(12.5)
    assert advance == 1250  # whole window consumed


def test_split_segments_trailing_single_timestamp_bounds_duration():
    toks = [ts(0.0), 5, ts(3.0)]
    segs, advance, single = split_segments_by_timestamps(_Spec, np.array(toks), 0.0, 30.0, 3000)
    assert segs[0][1] == pytest.approx(3.0)
    assert advance == 3000


def test_beam_search_structure(engine, rng):
    """Beam decode must run and return a valid result; with beam_size=1-vs-5
    both paths produce structurally identical outputs."""
    from whisperlive_tpu.ops import mel as mel_ops

    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    padded = mel_ops.pad_or_trim(audio)[None]
    _, cross = engine.prepare(padded)
    opts = TranscribeOptions(
        language="en", beam_size=5, temperatures=(0.0,),
        log_prob_threshold=None, no_speech_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=12,
    )
    p, s = engine.build_prompt(opts)
    (res,) = engine.decode_batch(cross, [p], [s], opts)
    assert len(res.tokens) <= 12
    assert np.isfinite(res.avg_logprob)
    # greedy result exists too and both decode the same window
    opts_g = TranscribeOptions(
        language="en", beam_size=1, temperatures=(0.0,),
        log_prob_threshold=None, no_speech_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=12,
    )
    (res_g,) = engine.decode_batch(cross, [p], [s], opts_g)
    # beam-5 must be at least as good as greedy under the scoring it optimizes
    assert res.avg_logprob >= res_g.avg_logprob - 1e-3


def test_beam_chunked_matches_monolithic(engine, rng):
    """Preemptible (chunked) beam decode must be TOKEN-EXACT vs the
    monolithic beam program for any chunk size — segmentation only
    reroutes where the host syncs, never the math. Covers multi-item
    batches and a chunk that does not divide the decode length."""
    from whisperlive_tpu.ops import mel as mel_ops

    audio = np.stack([
        mel_ops.pad_or_trim((rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)),
        mel_ops.pad_or_trim((rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)),
    ])
    _, cross = engine.prepare(audio)
    opts = TranscribeOptions(
        language="en", beam_size=3, temperatures=(0.0,),
        log_prob_threshold=None, no_speech_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=17,
    )
    p, s = engine.build_prompt(opts)
    assert engine.beam_chunk == 0
    base = engine.decode_batch(cross, [p, p], [s, s], opts)
    try:
        for chunk in (1, 5, 64):
            engine.beam_chunk = chunk
            got = engine.decode_batch(cross, [p, p], [s, s], opts)
            for r0, r1 in zip(base, got):
                np.testing.assert_array_equal(r0.tokens, r1.tokens)
                assert r0.avg_logprob == pytest.approx(r1.avg_logprob)
                assert r0.no_speech_prob == pytest.approx(r1.no_speech_prob)
    finally:
        engine.beam_chunk = 0


def test_batched_transcriber_multiple_files(engine, rng):
    from whisperlive_tpu.engine.transcribe import BatchedTranscriber

    bt = BatchedTranscriber(engine)
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=12,
    )
    audios = [
        (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32),
    ]
    results = bt.transcribe(audios, opts)
    assert len(results) == 2
    for (segments, info), audio in zip(results, audios):
        assert info.duration == pytest.approx(len(audio) / 16000)
        for s in segments:
            assert s.start >= 0


def test_fused_transcribe_matches_split(engine, rng):
    """The single-dispatch fused program must equal prepare+detect+decode."""
    from whisperlive_tpu.ops import mel as mel_ops

    audio = np.zeros((1, mel_ops.N_SAMPLES), np.float32)
    audio[0, : 16000 * 3] = (rng.standard_normal(16000 * 3) * 0.1)
    opts = TranscribeOptions(
        language=None, temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=10,
    )
    # split path
    _, cross = engine.prepare(audio)
    (lang, prob), = engine.detect_language_from_cross(cross)
    p, s = engine.build_prompt(opts, language=lang)
    (split_res,) = engine.decode_batch(cross, [p], [s], opts, seed=7)

    # fused path with a placeholder language token
    p2, s2 = engine.build_prompt(opts, language="en")
    (fused_res,), langs, _ = engine.transcribe_batch(
        audio, [p2], [s2], [False], opts, seed=7
    )
    assert langs[0][0] == lang
    np.testing.assert_array_equal(fused_res.tokens, split_res.tokens)
    assert fused_res.avg_logprob == pytest.approx(split_res.avg_logprob, abs=1e-4)
    assert fused_res.no_speech_prob == pytest.approx(split_res.no_speech_prob, abs=1e-4)


def test_vad_filter_restores_timestamps(engine, rng):
    """Silence-collapsed decode restores original-time segment boundaries."""
    t = np.arange(16000) / 16000
    speech = (0.4 * np.sin(2 * np.pi * 200 * t) * np.sin(2 * np.pi * 4 * t)).astype(
        np.float32
    )
    audio = np.concatenate([
        np.zeros(16000 * 4, np.float32), speech, np.zeros(16000 * 3, np.float32)
    ])
    tr = Transcriber(engine)
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=10,
    )
    segments, info = tr.transcribe(
        audio, opts, vad_filter=True,
        vad_parameters={"min_silence_duration_ms": 500, "speech_pad_ms": 100},
    )
    assert info.duration == pytest.approx(8.0)
    # any produced segment must sit near the real speech region, not at 0 s
    for s in segments:
        assert s.start >= 3.0, f"timestamp not restored: {s.start}"


def test_vad_filter_all_silence_returns_empty(engine):
    tr = Transcriber(engine)
    segments, info = tr.transcribe(
        np.zeros(16000 * 5, np.float32),
        TranscribeOptions(language="en", temperatures=(0.0,),
                          log_prob_threshold=None, no_speech_threshold=None,
                          compression_ratio_threshold=None, max_new_tokens=4),
        vad_filter=True,
    )
    assert segments == []
    assert info.duration == pytest.approx(5.0)


def test_quality_gate_silence_override_parity():
    """generate_with_fallback gate truth table (reference
    transcriber_faster_whisper.py:1426-1462): the silence override
    (no_speech > thresh AND avg_logprob < thresh) clears `needs_fallback`
    REGARDLESS of which gate fired — including a compression-only failure
    on a silent window."""
    from whisperlive_tpu.engine.engine import DecodeResult, fails_quality_gates

    opts = TranscribeOptions()  # defaults 2.4 / -1.0 / 0.6

    def r(cr, lp, ns):
        return DecodeResult(
            tokens=[1], avg_logprob=lp, compression_ratio=cr,
            no_speech_prob=ns, temperature=0.0,
        )

    # clean result -> keep
    assert not fails_quality_gates(opts, r(1.0, -0.2, 0.1))
    # compression fails, speech -> retry
    assert fails_quality_gates(opts, r(3.0, -0.2, 0.1))
    # logprob fails, speech -> retry
    assert fails_quality_gates(opts, r(1.0, -2.0, 0.1))
    # logprob fails + silent -> silence override keeps
    assert not fails_quality_gates(opts, r(1.0, -2.0, 0.9))
    # BOTH fail + silent -> silence override keeps (reference 1455-1461)
    assert not fails_quality_gates(opts, r(3.0, -2.0, 0.9))
    # compression fails on a CONFIDENT silent window (logprob above thresh):
    # override condition requires avg_logprob < thresh -> still retries,
    # exactly like the reference
    assert fails_quality_gates(opts, r(3.0, -0.2, 0.9))
    # gates disabled -> never retries
    opts2 = TranscribeOptions(
        compression_ratio_threshold=None, log_prob_threshold=None,
    )
    assert not fails_quality_gates(opts2, r(9.0, -9.0, 0.9))


def test_batched_transcriber_word_timestamps(engine, rng):
    """Word timings on >= 2 concurrent files through the batched path:
    every file's windows must run the alignment pass against its OWN
    batch lane (item_index), and emitted segments carry a words list
    (BatchedInferencePipeline word_timestamps capability). Word-value
    correctness is covered by the sequential fixture + oracle tests —
    the hermetic byte tokenizer decodes most random token ids to '', so
    this test checks the batched wiring, not text."""
    from whisperlive_tpu.engine.transcribe import BatchedTranscriber

    bt = BatchedTranscriber(engine)
    align_calls: list[int] = []
    orig_align = engine.align_words

    def spy(cross_kv, item_index, *a, **kw):
        align_calls.append(item_index)
        return orig_align(cross_kv, item_index, *a, **kw)

    engine.align_words = spy
    try:
        opts = TranscribeOptions(
            language="en", temperatures=(0.0,), log_prob_threshold=None,
            no_speech_threshold=None, compression_ratio_threshold=None,
            max_new_tokens=14, word_timestamps=True,
        )
        audios = [
            (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32),
            (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32),
        ]
        results = bt.transcribe(audios, opts)
    finally:
        engine.align_words = orig_align
    assert len(results) == 2
    # both batch lanes aligned (the first decode round has items 0 and 1)
    assert 0 in align_calls and 1 in align_calls
    for segments, info in results:
        for s in segments:
            assert s.words is not None
            for w in s.words:
                assert 0.0 <= w.start <= w.end
                assert 0.0 <= w.probability <= 1.0
                assert isinstance(w.word, str)


def test_batched_transcriber_vad_filter(engine, rng):
    """vad_filter collapses leading silence and restores original times:
    a file whose speech starts at 2 s must come back with segments at
    ~>= 2 s, and an all-silence file yields no segments."""
    from whisperlive_tpu.engine.transcribe import BatchedTranscriber

    bt = BatchedTranscriber(engine)
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=10,
    )
    speechy = np.zeros(16000 * 5, np.float32)
    speechy[16000 * 2:] = (
        rng.standard_normal(16000 * 3) * 0.3
    ).astype(np.float32)
    silent = np.zeros(16000 * 3, np.float32)
    results = bt.transcribe([speechy, silent], opts, vad_filter=True)
    (segs_a, info_a), (segs_b, info_b) = results
    assert info_a.duration == pytest.approx(5.0)
    assert info_b.duration == pytest.approx(3.0)
    assert segs_b == []
    for s in segs_a:
        assert s.start >= 1.0  # restored into the original timeline


def test_batched_single_file_consistent_with_sequential(engine, rng):
    """BatchedTranscriber on one file must advance through the audio the
    same way the sequential Transcriber does (same segment boundaries and
    token streams): the two seek loops are independent code, so this pins
    their shared behavioral contract."""
    from whisperlive_tpu.engine.transcribe import BatchedTranscriber, Transcriber

    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=16, condition_on_previous_text=False,
    )
    audio = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    seq_segments, seq_info = Transcriber(engine).transcribe(audio, opts)
    ((bat_segments, bat_info),) = BatchedTranscriber(engine).transcribe(
        [audio], opts
    )
    assert bat_info.duration == pytest.approx(seq_info.duration)
    # same number of segments with the same token streams; start/end can
    # differ at the window edge (sequential uses full-clip mel features,
    # batched re-pads per window) but the decoded content must agree
    assert [s.tokens for s in bat_segments] == [s.tokens for s in seq_segments]


def test_best_of_sampling_exact_parity(rng):
    """best_of=K at T>0 tiles the item K times inside one decode program
    and keeps the best hypothesis by avg_logprob (faster-whisper best_of=5
    via CTranslate2 num_hypotheses, transcriber defaults). Parity is exact:
    manually tiling the batch K times with best_of disabled and reducing by
    max avg_logprob must reproduce the same tokens and score, because the
    tiled program is identical (same bucket, same padding, same PRNG)."""
    import jax
    import jax.numpy as jnp

    from whisperlive_tpu.models.whisper import init_params
    from whisperlive_tpu.ops import mel as mel_ops

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    eng = WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
        batch_buckets=(1, 2, 4, 8),
    )
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    padded = mel_ops.pad_or_trim(audio)[None]
    _, cross = eng.prepare(padded)
    base = dict(
        language="en", temperatures=(0.5,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=12,
    )
    p, s = eng.build_prompt(TranscribeOptions(**base))

    k = 5
    (res_bo,) = eng.decode_batch(
        cross, [p], [s], TranscribeOptions(**base, best_of=k),
        temperatures=[0.5], seed=3,
    )

    # manual tiling: same gather the engine performs internally
    # (bucket(1*5)=8, item 0 repeated 5x, zero-padded)
    gather = jnp.zeros((8,), jnp.int32)
    cross8 = jax.tree.map(lambda a: jnp.take(a, gather, axis=2), cross)
    manual = eng.decode_batch(
        cross8, [p] * k, [s] * k, TranscribeOptions(**base, best_of=1),
        temperatures=[0.5] * k, seed=3,
    )
    assert len(manual) == k
    best = max(manual, key=lambda r: r.avg_logprob)
    np.testing.assert_array_equal(res_bo.tokens, best.tokens)
    assert res_bo.avg_logprob == pytest.approx(best.avg_logprob)
    # the K lanes must actually differ (independent draws per row)
    assert len({tuple(int(t) for t in r.tokens) for r in manual}) > 1

    # T=0: best_of is a no-op (greedy); result equals the best_of=1 decode
    g = dict(base, temperatures=(0.0,))
    (r_a,) = eng.decode_batch(
        cross, [p], [s], TranscribeOptions(**g, best_of=k),
        temperatures=[0.0], seed=3,
    )
    (r_b,) = eng.decode_batch(
        cross, [p], [s], TranscribeOptions(**g, best_of=1),
        temperatures=[0.0], seed=3,
    )
    np.testing.assert_array_equal(r_a.tokens, r_b.tokens)


def test_multilingual_per_window_detection(engine, rng):
    """options.multilingual re-runs language detection on every window even
    when the session language is pinned, splicing the detected token into
    that window's prompt (faster-whisper `multilingual`,
    transcriber_faster_whisper.py:214-222)."""
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    base = dict(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    calls = []
    orig = engine.detect_language_from_cross

    def spy(cross_kv):
        out = orig(cross_kv)
        calls.append(out[0][0])
        return out

    engine.detect_language_from_cross = spy
    try:
        # pinned language, multilingual off -> no detection at all
        t.transcribe(audio, TranscribeOptions(**base))
        assert calls == []
        # multilingual on -> one detection per window (1 window here)
        _, info = t.transcribe(
            audio, TranscribeOptions(**base, multilingual=True)
        )
    finally:
        engine.detect_language_from_cross = orig
    assert len(calls) == 1
    assert info.language == "en"  # info keeps the session language


def test_beam_patience_widens_lanes(engine, rng):
    """patience=1.0 compiles the exact same beam program (identical
    results); patience>1 widens the lane pool and must return a valid,
    at-least-as-good length-penalized hypothesis."""
    from whisperlive_tpu.ops import mel as mel_ops

    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    padded = mel_ops.pad_or_trim(audio)[None]
    _, cross = engine.prepare(padded)
    base = dict(
        language="en", beam_size=3, temperatures=(0.0,),
        log_prob_threshold=None, no_speech_threshold=None,
        compression_ratio_threshold=None, max_new_tokens=10,
    )
    p, s = engine.build_prompt(TranscribeOptions(**base))
    (r1,) = engine.decode_batch(
        cross, [p], [s], TranscribeOptions(**base, patience=1.0)
    )
    (r_default,) = engine.decode_batch(
        cross, [p], [s], TranscribeOptions(**base)
    )
    np.testing.assert_array_equal(r1.tokens, r_default.tokens)
    (r2,) = engine.decode_batch(
        cross, [p], [s], TranscribeOptions(**base, patience=2.0)
    )
    assert len(r2.tokens) <= 10
    assert np.isfinite(r2.avg_logprob)


def test_detect_language_segments_and_threshold(engine, rng):
    """Transcriber.detect_language (reference detect_language,
    transcriber_faster_whisper.py:1716-1789): threshold early-exit vs
    multi-segment majority vote. Random weights give near-uniform language
    probabilities (~1/99), so threshold=0.5 never clears and the majority
    path runs; threshold=None accepts the first window."""
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 70) * 0.1).astype(np.float32)

    lang, prob, all_probs = t.detect_language(
        audio=audio, language_detection_segments=3,
        language_detection_threshold=0.5,
    )
    codes = engine.tokenizer.spec.language_codes
    assert lang in codes
    assert 0.0 < prob < 0.5  # majority path: nothing cleared the bar
    assert len(all_probs) == len(codes)
    probs = [p for _, p in all_probs]
    assert probs == sorted(probs, reverse=True)
    assert sum(probs) == pytest.approx(1.0, abs=1e-3)

    # threshold=None: first window decides; must equal a fresh
    # single-segment probe
    lang1, prob1, _ = t.detect_language(
        audio=audio, language_detection_threshold=None
    )
    lang2, prob2, _ = t.detect_language(
        audio=audio, language_detection_segments=1,
        language_detection_threshold=0.0,
    )
    assert (lang1, prob1) == (lang2, prob2)

    with pytest.raises(ValueError):
        t.detect_language()


def test_transcribe_reports_all_language_probs(engine, rng):
    """info.all_language_probs is populated when the language was
    auto-detected (reference TranscriptionInfo.all_language_probs) and
    stays None when the session language is pinned."""
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    base = dict(
        temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )
    _, info = t.transcribe(audio, TranscribeOptions(**base))
    assert info.all_language_probs is not None
    assert info.all_language_probs[0][0] == info.language
    assert info.all_language_probs[0][1] == pytest.approx(
        info.language_probability
    )
    _, info2 = t.transcribe(audio, TranscribeOptions(**base, language="en"))
    assert info2.all_language_probs is None


def test_chunk_length_shortens_seek_windows(engine, rng):
    """chunk_length caps every seek window (faster-whisper chunk_length):
    a 10 s clip at chunk_length=4 decodes 3 windows where the default
    decodes 1. without_timestamps makes each window consume exactly its
    segment_size, so the count is deterministic with random weights."""
    t = Transcriber(engine)
    audio = (rng.standard_normal(16000 * 10) * 0.1).astype(np.float32)
    base = dict(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8, without_timestamps=True,
    )
    calls = []
    orig = engine.decode_with_fallback

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    engine.decode_with_fallback = spy
    try:
        t.transcribe(audio, TranscribeOptions(**base))
        default_windows = len(calls)
        calls.clear()
        segs, _ = t.transcribe(
            audio, TranscribeOptions(**base, chunk_length=4),
            log_progress=True,  # smoke the tqdm path too
        )
        chunked_windows = len(calls)
    finally:
        engine.decode_with_fallback = orig
    assert default_windows == 1
    assert chunked_windows == 3
    # timestamps stay absolute: later windows offset by the 4 s stride
    assert all(s.start < 10.0 + 4.0 for s in segs)

    with pytest.raises(ValueError):
        t.transcribe(audio, TranscribeOptions(**base, chunk_length=31))


def test_batched_chunk_length(engine, rng):
    """BatchedTranscriber honors chunk_length: per-file seek cursors
    advance by the shortened window."""
    from whisperlive_tpu.engine.transcribe import BatchedTranscriber

    bt = BatchedTranscriber(engine)
    audio = (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8, without_timestamps=True, chunk_length=4,
    )
    calls = []
    orig = engine.decode_with_fallback

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    engine.decode_with_fallback = spy
    try:
        (result,) = bt.transcribe([audio], opts)
    finally:
        engine.decode_with_fallback = orig
    assert len(calls) == 2  # 8 s / 4 s windows
    segments, info = result
    assert info.duration == pytest.approx(8.0)


def test_pipelined_batches_match_sync(engine, rng):
    """Depth-2 pipelining (transcribe_batch_async): dispatching batch N+1
    before resolving batch N must be token-identical to the sequential
    path — the pending handle only defers the device->host fetch, never
    the computation (bench.py and BatchedTranscriber rely on this to
    overlap the per-batch fixed dispatch cost with device compute)."""
    from whisperlive_tpu.ops import mel as mel_ops

    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=10,
    )
    p, s = engine.build_prompt(opts, language="en")
    batches = []
    for i in range(3):
        audio = np.zeros((2, mel_ops.N_SAMPLES), np.float32)
        audio[:, : 16000 * 2] = (
            rng.standard_normal((2, 16000 * 2)) * 0.1
        )
        batches.append(audio)

    sync = [
        engine.transcribe_batch(a, [p, p], [s, s], [True, True], opts, seed=i)
        for i, a in enumerate(batches)
    ]

    pending, piped = [], []
    for i, a in enumerate(batches):
        pending.append(
            engine.transcribe_batch_async(
                a, [p, p], [s, s], [True, True], opts, seed=i
            )
        )
        if len(pending) > 1:
            piped.append(pending.pop(0).resolve())
    piped.extend(h.resolve() for h in pending)

    for (res_s, langs_s, _), (res_p, langs_p, _) in zip(sync, piped):
        assert langs_s == langs_p
        for rs, rp in zip(res_s, res_p):
            np.testing.assert_array_equal(rs.tokens, rp.tokens)
            assert rs.avg_logprob == pytest.approx(rp.avg_logprob)
            assert rs.no_speech_prob == pytest.approx(rp.no_speech_prob)
