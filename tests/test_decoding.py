"""Whisper logit-rule semantics (openai-whisper behavior, which the
reference's CTranslate2 sampler implements in C++). State is the lockstep
layout: all items sample their s-th token at the same loop iteration."""

import numpy as np

import jax
import jax.numpy as jnp

from whisperlive_tpu.ops import decoding as dec

SPEC = dec.DecodingSpec(
    n_vocab=120,
    eot=100,
    blank=32,
    no_speech=104,
    timestamp_begin=106,
    max_initial_timestamp_index=5,
    max_length=16,
)

MAX_GEN = 8


def make_state(prompt_lens, sampled_rows):
    """State double: per-item prompt lengths + equal-length sampled rows."""
    b = len(prompt_lens)
    state = dec.init_sampler_state(
        SPEC, jnp.asarray(prompt_lens, jnp.int32), MAX_GEN
    )
    n = len(sampled_rows[0])
    assert all(len(r) == n for r in sampled_rows), "lockstep: equal lengths"
    for s in range(n):
        toks = jnp.asarray([row[s] for row in sampled_rows], jnp.int32)
        state = state._replace(
            sampled=state.sampled.at[:, s].set(toks),
            step=state.step + 1,
            last_ts=jnp.where(toks >= SPEC.timestamp_begin, toks, state.last_ts),
        )
    return state


def apply(state, ts_enabled=True, suppress=(), logits=None):  # helper
    b = state.sampled.shape[0]
    if logits is None:
        logits = jnp.zeros((b, SPEC.n_vocab), jnp.float32)
    mask = dec.build_suppress_mask(SPEC.n_vocab, suppress)
    return np.asarray(
        dec.apply_logit_rules(
            SPEC, jnp.asarray(logits), state, mask, jnp.full((b,), ts_enabled, bool)
        )
    )


def test_first_token_must_be_initial_timestamp():
    state = make_state([1], [[]])
    out = apply(state)
    # text + eot + blank suppressed, timestamps beyond the cap suppressed
    assert np.all(out[0, : SPEC.timestamp_begin] == dec.NEG_INF)
    lim = SPEC.timestamp_begin + SPEC.max_initial_timestamp_index
    assert np.all(out[0, SPEC.timestamp_begin : lim + 1] == 0)
    assert np.all(out[0, lim + 1 :] == dec.NEG_INF)


def test_after_opening_timestamp_text_must_follow():
    # sampled = [ts]: the initial timestamp OPENS a segment; openai treats
    # len(sampled) < 2 as "penultimate was timestamp" -> timestamps banned.
    state = make_state([1], [[SPEC.timestamp_begin + 2]])
    out = apply(state)
    assert np.all(out[0, SPEC.timestamp_begin :] == dec.NEG_INF)
    assert out[0, 10] != dec.NEG_INF  # text fine


def test_after_closing_timestamp_text_is_suppressed():
    # sampled = [ts, text, ts2]: ts2 closes the segment; next must be a
    # timestamp (opening the next segment, same value allowed) or EOT.
    ts2 = SPEC.timestamp_begin + 2
    state = make_state([1], [[SPEC.timestamp_begin, 11, ts2]])
    # Give EOT a dominant logit so the "sum of timestamp probs beats best
    # text prob" rule doesn't additionally kick in.
    logits = np.zeros((1, SPEC.n_vocab), np.float32)
    logits[0, SPEC.eot] = 10.0
    out = apply(state, logits=logits)
    assert np.all(out[0, : SPEC.eot] == dec.NEG_INF)  # text banned
    assert out[0, SPEC.eot] == 10.0  # eot allowed
    assert out[0, ts2] == 0  # same ts allowed (pair)
    assert out[0, ts2 - 1] == dec.NEG_INF  # decreasing banned


def test_after_timestamp_pair_timestamps_suppressed():
    ts = SPEC.timestamp_begin + 2
    state = make_state([1], [[SPEC.timestamp_begin, 11, ts, ts]])
    out = apply(state)
    assert np.all(out[0, SPEC.timestamp_begin :] == dec.NEG_INF)
    assert out[0, 10] != dec.NEG_INF  # text fine


def test_timestamps_nondecreasing_after_text():
    ts = SPEC.timestamp_begin + 3
    state = make_state([1], [[ts, ts, 11, 12]])
    out = apply(state)
    # next timestamp must be strictly greater than the completed pair
    assert np.all(out[0, SPEC.timestamp_begin : ts + 1] == dec.NEG_INF)
    assert out[0, ts + 1] != dec.NEG_INF


def test_suppress_blank_only_first_step():
    state = make_state([1], [[]])
    out = apply(state, ts_enabled=False)
    assert out[0, SPEC.blank] == dec.NEG_INF
    assert out[0, SPEC.eot] == dec.NEG_INF
    state2 = make_state([1], [[11]])
    out2 = apply(state2, ts_enabled=False)
    assert out2[0, SPEC.blank] == 0
    assert out2[0, SPEC.eot] == 0


def test_notimestamps_suppresses_all_ts():
    state = make_state([1], [[11]])
    out = apply(state, ts_enabled=False)
    assert np.all(out[0, SPEC.timestamp_begin :] == dec.NEG_INF)


def test_static_suppress_mask():
    state = make_state([1], [[11]])
    out = apply(state, ts_enabled=False, suppress=[7, 9])
    assert out[0, 7] == dec.NEG_INF and out[0, 9] == dec.NEG_INF


def test_prob_rule_forces_timestamp():
    state = make_state([1], [[11]])
    logits = np.zeros((1, SPEC.n_vocab), np.float32)
    logits[0, SPEC.timestamp_begin :] = 5.0
    out = np.asarray(
        dec.apply_logit_rules(
            SPEC,
            jnp.asarray(logits),
            state,
            dec.build_suppress_mask(SPEC.n_vocab, []),
            jnp.ones((1,), bool),
        )
    )
    assert np.all(out[0, : SPEC.timestamp_begin] == dec.NEG_INF)


def test_per_item_rules_differ_in_one_batch():
    # item 0 just closed a pair (text banned); item 1 is mid-text (text ok)
    ts = SPEC.timestamp_begin + 2
    state = make_state([1, 1], [[SPEC.timestamp_begin, 11], [11, 12]])
    # give both items a dominant EOT so the prob rule stays quiet
    logits = np.zeros((2, SPEC.n_vocab), np.float32)
    logits[:, SPEC.eot] = 10.0
    # item 0: last sampled is text after opening ts -> text allowed
    out = apply(state, logits=logits)
    assert out[0, 11] != dec.NEG_INF
    assert out[1, 11] != dec.NEG_INF


def test_sample_greedy_vs_temperature():
    logits = jnp.asarray(np.eye(1, 120, 42, dtype=np.float32) * 10)
    tok, lp = dec.sample_next(logits, jnp.zeros((1,)), jax.random.PRNGKey(0))
    assert int(tok[0]) == 42
    assert lp.shape == (1,)
    tok2, _ = dec.sample_next(logits, jnp.ones((1,)), jax.random.PRNGKey(0))
    assert 0 <= int(tok2[0]) < 120


def test_advance_state_finish_and_eot_padding():
    state = make_state([1, 1], [[], []])
    nxt = jnp.asarray([SPEC.eot, 11], np.int32)
    lp = jnp.asarray([-1.0, -2.0], np.float32)
    state = dec.advance_state(SPEC, state, nxt, lp)
    assert bool(state.finished[0]) and not bool(state.finished[1])
    assert float(state.sum_logprob[0]) == -1.0
    assert int(state.step) == 1
    assert int(state.gen_len[0]) == 1 and int(state.gen_len[1]) == 1
    # finished item stops accumulating; step still advances in lockstep
    state2 = dec.advance_state(SPEC, state, jnp.asarray([12, 12]), lp)
    assert int(state2.gen_len[0]) == 1  # frozen
    assert int(state2.gen_len[1]) == 2
    assert float(state2.sum_logprob[0]) == -1.0
    assert int(state2.step) == 2


def test_advance_state_max_length_cap():
    # prompt_len 14 + 2 sampled tokens hits max_length=16
    state = make_state([14], [[11]])
    state = dec.advance_state(SPEC, state, jnp.asarray([12]), jnp.asarray([-0.5]))
    assert bool(state.finished[0])


def test_repetition_penalty_penalizes_seen():
    state = make_state([1], [[11]])
    logits = jnp.ones((1, SPEC.n_vocab), jnp.float32)
    out = np.asarray(
        dec.apply_repetition_penalty(logits, state, jnp.asarray([2.0], jnp.float32))
    )
    assert out[0, 11] == 0.5  # positive logit divided by penalty
    assert out[0, 12] == 1.0
    # token 0 appears in the buffer only as padding (idx >= step): not seen
    assert out[0, 0] == 1.0


def test_no_repeat_ngram_bans_completion():
    # sampled = [5, 6, 7, 5, 6]; with n=3, context (5,6) matched at pos 0,
    # so token 7 must be banned.
    state = make_state([1], [[5, 6, 7, 5, 6]])
    logits = jnp.zeros((1, SPEC.n_vocab), jnp.float32)
    out = np.asarray(dec.apply_no_repeat_ngram(logits, state, 3))
    assert out[0, 7] == dec.NEG_INF
    assert out[0, 8] == 0.0
    # disabled -> untouched
    out0 = np.asarray(dec.apply_no_repeat_ngram(logits, state, 0))
    assert np.all(out0 == 0.0)


def test_no_repeat_ngram_ignores_padding():
    # zeros in the padded tail must not create phantom (0,0)->0 ngrams
    state = make_state([1], [[0, 0]])
    logits = jnp.zeros((1, SPEC.n_vocab), jnp.float32)
    out = np.asarray(dec.apply_no_repeat_ngram(logits, state, 3))
    assert np.all(out == 0.0)  # only 2 sampled tokens: rule inactive


def test_suppress_blank_vector_disables_step0_rule():
    """suppress_blank=False (per-request option, threaded as a static
    program arg) must leave blank/EOT available at step 0."""
    state = make_state([2], [[]])
    mask = dec.build_suppress_mask(SPEC.n_vocab, ())
    # without_timestamps mode: otherwise the first-token-must-be-a-
    # timestamp rule masks every text token at step 0 regardless
    filtered = np.asarray(dec.apply_logit_rules(
        SPEC, jnp.zeros((1, SPEC.n_vocab)), state, mask,
        jnp.zeros((1,), bool), suppress_blank=jnp.zeros((1,), bool),
    ))
    assert filtered[0, SPEC.blank] > dec.NEG_INF / 2
    # default (None) keeps the rule
    default = apply(state, ts_enabled=False)
    assert default[0, SPEC.blank] <= dec.NEG_INF / 2


def test_max_initial_timestamp_vector_overrides_spec():
    """max_initial_timestamp (per-request) bounds the FIRST timestamp."""
    state = make_state([2], [[]])
    mask = dec.build_suppress_mask(SPEC.n_vocab, ())
    filtered = np.asarray(dec.apply_logit_rules(
        SPEC, jnp.zeros((1, SPEC.n_vocab)), state, mask,
        jnp.ones((1,), bool),
        max_initial_ts_idx=jnp.asarray([2], jnp.int32),
    ))
    tb = SPEC.timestamp_begin
    assert filtered[0, tb + 2] > dec.NEG_INF / 2  # allowed
    assert filtered[0, tb + 3] <= dec.NEG_INF / 2  # beyond the override
    # spec default allows up to index 5
    default = apply(state)
    assert default[0, tb + 5] > dec.NEG_INF / 2


def test_repetition_penalty_noop_path_exact():
    """The lax.cond fast path (all penalties 1.0) must be a true no-op."""
    state = make_state([2], [[50, 51]])
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, SPEC.n_vocab)),
        jnp.float32,
    )
    out = dec.apply_repetition_penalty(logits, state, jnp.ones((1,)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))
    # and the active path still penalizes
    pen = np.asarray(
        dec.apply_repetition_penalty(logits, state, jnp.full((1,), 2.0))
    )
    assert pen[0, 50] != np.asarray(logits)[0, 50]


# ---------------------------------------------------------------------------
# CT2 full-sequence penalty semantics: penalties see the forced prompt
# prefix too (CTranslate2 applies both processors over the whole target
# sequence, which for whisper includes previous-text conditioning and the
# sot sequence — parity pinned against HF's processors, which share the
# full-sequence convention).
# ---------------------------------------------------------------------------


def test_right_align_prompt():
    p = jnp.asarray([[7, 8, 9, 0, 0], [1, 2, 3, 4, 5]], jnp.int32)
    plen = jnp.asarray([3, 5], jnp.int32)
    out = np.asarray(dec.right_align_prompt(p, plen))
    np.testing.assert_array_equal(out[0], [-1, -1, 7, 8, 9])
    np.testing.assert_array_equal(out[1], [1, 2, 3, 4, 5])


def test_repetition_penalty_counts_prompt_tokens():
    state = make_state([3], [[11]])
    prompts = jnp.asarray([[40, 41, 42, 0, 0, 0]], jnp.int32)  # pad 0s fake
    plen = jnp.asarray([3], jnp.int32)
    logits = jnp.ones((1, SPEC.n_vocab), jnp.float32)
    out = np.asarray(dec.apply_repetition_penalty(
        logits, state, jnp.asarray([2.0], jnp.float32),
        prompt_tokens=prompts, prompt_len=plen,
    ))
    assert out[0, 40] == 0.5 and out[0, 42] == 0.5  # prompt tokens seen
    assert out[0, 11] == 0.5  # sampled still seen
    assert out[0, 0] == 1.0  # pad beyond prompt_len: not seen
    # without the prompt args the prompt tokens are unseen (old behavior)
    old = np.asarray(dec.apply_repetition_penalty(
        logits, state, jnp.asarray([2.0], jnp.float32)
    ))
    assert old[0, 40] == 1.0


def test_no_repeat_ngram_spans_prompt_boundary():
    # prompt ends ... 5, 6, 7; sampled = [5, 6] -> context (5,6) matches the
    # prompt-internal window at (5,6) whose follower is 7: ban 7.
    state = make_state([4], [[5, 6]])
    prompts = jnp.asarray([[9, 5, 6, 7, 0, 0]], jnp.int32)
    phist = dec.right_align_prompt(prompts, jnp.asarray([4], jnp.int32))
    logits = jnp.zeros((1, SPEC.n_vocab), jnp.float32)
    out = np.asarray(dec.apply_no_repeat_ngram(state=state, logits=logits,
                                               n=3, prompt_hist=phist))
    assert out[0, 7] == dec.NEG_INF
    assert out[0, 8] == 0.0
    # boundary-straddling window: prompt ...[6, 7] + sampled [5, ...]
    # context here: last two = (6, 7)? build a case where the matching
    # window itself crosses the boundary: prompt [1, 2], sampled [3, 1, 2]
    # -> context (1, 2); window (1,2) at the boundary (prompt 1,2 + follower
    # sampled 3): ban 3.
    state2 = make_state([2], [[3, 1, 2]])
    prompts2 = jnp.asarray([[1, 2, 0, 0, 0, 0]], jnp.int32)
    phist2 = dec.right_align_prompt(prompts2, jnp.asarray([2], jnp.int32))
    out2 = np.asarray(dec.apply_no_repeat_ngram(state=state2, logits=logits,
                                                n=3, prompt_hist=phist2))
    assert out2[0, 3] == dec.NEG_INF
    # pad region must not fabricate matches
    assert out2[0, 0] == 0.0


def test_penalties_match_hf_processors_fuzz():
    """Full-sequence parity vs transformers' reference processors on random
    prompt/generated splits (the CT2 convention both implement)."""
    import torch
    from transformers.generation.logits_process import (
        NoRepeatNGramLogitsProcessor,
        RepetitionPenaltyLogitsProcessor,
    )

    rng = np.random.default_rng(7)
    v = SPEC.n_vocab
    for case in range(8):
        n = int(rng.integers(2, 5))
        g = int(rng.integers(n, MAX_GEN + 1))
        plens = rng.integers(1, 7, size=2)
        pmax = 8
        prompts = rng.integers(1, 12, size=(2, pmax)).astype(np.int32)
        sampled = rng.integers(1, 12, size=(2, g)).astype(np.int32)
        state = make_state(list(plens), [list(r) for r in sampled])
        scores = rng.standard_normal((2, v)).astype(np.float32)

        phist = dec.right_align_prompt(
            jnp.asarray(prompts), jnp.asarray(plens, jnp.int32)
        )
        ours_ngram = np.asarray(dec.apply_no_repeat_ngram(
            jnp.asarray(scores), state, n, prompt_hist=phist
        ))
        ours_rep = np.asarray(dec.apply_repetition_penalty(
            jnp.asarray(scores), state, jnp.full((2,), 1.7, jnp.float32),
            prompt_tokens=jnp.asarray(prompts),
            prompt_len=jnp.asarray(plens, jnp.int32),
        ))
        for b in range(2):
            seq = np.concatenate([prompts[b, : plens[b]], sampled[b]])
            ids = torch.tensor(seq[None].astype(np.int64))
            sc = torch.tensor(scores[b][None])
            hf_ngram = NoRepeatNGramLogitsProcessor(n)(ids, sc.clone()).numpy()[0]
            banned_hf = ~np.isfinite(hf_ngram)
            banned_us = ours_ngram[b] <= dec.NEG_INF / 2
            np.testing.assert_array_equal(banned_us, banned_hf,
                                          err_msg=f"case {case} item {b}")
            hf_rep = RepetitionPenaltyLogitsProcessor(1.7)(ids, sc.clone()).numpy()[0]
            np.testing.assert_allclose(ours_rep[b], hf_rep, rtol=1e-5,
                                       err_msg=f"case {case} item {b}")
