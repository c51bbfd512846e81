"""Whisper decoding logit rules as fixed-shape batched JAX functions.

The reference delegates these to CTranslate2's C++ sampler (options listed
in SURVEY §2.9a: suppress_blank, suppress_tokens, max_initial_timestamp,
timestamp pairing rules, repetition penalty). Here they are pure functions
on `[B, V]` logits driven by a small carried state, so the whole sampling
loop — rules included — lives inside one `lax.while_loop` on the TPU, with
per-item state (different prompt lengths, languages, temperatures) and no
host round-trip per token.

Batch-lockstep layout (TPU-critical): every item in a batch samples its
s-th token at the same loop iteration, so the sampled-token buffer is
indexed by a batch-UNIFORM scalar `step` — all buffer reads/writes are
dynamic slices, never per-item scatters (which lower to slow generic TPU
scatters). Per-item prompt lengths live only in attention masks and
position indices.

All rules follow the openai-whisper semantics, which is what the
faster-whisper output the reference serves is built on.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class DecodingSpec:
    """Static (compile-time) decoding constants for one model/tokenizer."""

    n_vocab: int
    eot: int
    blank: int  # token id of " "
    no_speech: int
    timestamp_begin: int
    max_initial_timestamp_index: int = 50  # 1.0 s
    max_length: int = 448  # total tokens incl. prompt


class SamplerState(NamedTuple):
    """Lockstep decode state.

    sampled:     [B, MAX_GEN] sampled tokens, column s = step s (uniform)
    step:        [] scalar — tokens sampled so far (same for every item)
    prompt_len:  [B] true prompt lengths (for the max_length cap)
    gen_len:     [B] per-item sampled count (stops growing at EOT)
    last_ts:     [B] most recent sampled timestamp token id (or
                 timestamp_begin - 1 when none was sampled yet)
    finished:    [B] bool
    sum_logprob: [B] accumulated logprob of sampled tokens (f32)
    """

    sampled: jax.Array
    step: jax.Array
    prompt_len: jax.Array
    gen_len: jax.Array
    last_ts: jax.Array
    finished: jax.Array
    sum_logprob: jax.Array


def init_sampler_state(
    spec: DecodingSpec, prompt_len: jax.Array, max_gen: int
) -> SamplerState:
    b = prompt_len.shape[0]
    return SamplerState(
        sampled=jnp.zeros((b, max_gen), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        prompt_len=prompt_len.astype(jnp.int32),
        gen_len=jnp.zeros((b,), jnp.int32),
        last_ts=jnp.full((b,), spec.timestamp_begin - 1, jnp.int32),
        finished=jnp.zeros((b,), bool),
        sum_logprob=jnp.zeros((b,), jnp.float32),
    )


def _col(sampled: jax.Array, idx) -> jax.Array:
    """sampled[:, idx] with a scalar (traced) index — dynamic slice."""
    return jax.lax.dynamic_slice_in_dim(
        sampled, jnp.maximum(idx, 0), 1, axis=1
    )[:, 0]


def apply_logit_rules(
    spec: DecodingSpec,
    logits: jax.Array,  # [B, V] f32
    state: SamplerState,
    suppress_mask: jax.Array,  # [V] bool — True = always suppress
    timestamps_enabled: jax.Array,  # [B] bool — False if <|notimestamps|> prompt
    suppress_blank: jax.Array | None = None,  # [B] bool; None = all True
    max_initial_ts_idx: jax.Array | None = None,  # [B] i32; None = spec value
) -> jax.Array:
    """All Whisper logit filters, batched. Returns filtered logits [B, V].

    suppress_blank / max_initial_ts_idx are the per-request forms of the
    faster-whisper options of the same names (traced vectors — no
    recompile per value); None keeps the compile-time defaults.
    """
    b, v = logits.shape
    vocab = jnp.arange(v)[None, :]  # [1, V]
    step = state.step  # scalar — uniform across the batch

    # --- static suppress list (non-speech symbols + control specials) ------
    logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)

    # --- SuppressBlank: first sampled token may not be " " or EOT ----------
    first = step == 0
    blank_mask = (vocab == spec.blank) | (vocab == spec.eot)
    blank_rule = first & blank_mask
    if suppress_blank is not None:
        blank_rule = blank_rule & suppress_blank[:, None]
    logits = jnp.where(blank_rule, NEG_INF, logits)

    # --- timestamp rules ----------------------------------------------------
    last_tok = _col(state.sampled, step - 1)
    penult_tok = _col(state.sampled, step - 2)
    last_was_ts = (step >= 1) & (last_tok >= spec.timestamp_begin)
    penult_was_ts = (step < 2) | (penult_tok >= spec.timestamp_begin)

    is_ts = vocab >= spec.timestamp_begin  # [1, V]
    is_text = vocab < spec.eot

    # Timestamps come in pairs: after <ts> <ts>, the next token must be text;
    # after text <ts>, the next must be a timestamp or EOT.
    suppress_ts = (last_was_ts & penult_was_ts)[:, None] & is_ts
    suppress_text = (last_was_ts & ~penult_was_ts)[:, None] & is_text

    # Timestamps are non-decreasing. Lower bound is last_ts when we are
    # completing a pair, last_ts + 1 otherwise.
    lower = jnp.where(last_was_ts & ~penult_was_ts, state.last_ts, state.last_ts + 1)
    has_ts = state.last_ts >= spec.timestamp_begin
    suppress_low_ts = (has_ts[:, None]) & is_ts & (vocab < lower[:, None])

    # First sampled token must be a timestamp, bounded by max_initial_timestamp.
    if max_initial_ts_idx is None:
        init_lim = jnp.full(
            (b, 1), spec.timestamp_begin + spec.max_initial_timestamp_index
        )
    else:
        init_lim = (spec.timestamp_begin + max_initial_ts_idx)[:, None]
    suppress_first = first & (~is_ts | (vocab > init_lim))
    # (EOT stays suppressed at step 0 via SuppressBlank above.)

    # <|notimestamps|> is never a valid sample while timestamp rules are
    # active (openai ApplyTimestampRules / HF WhisperTimeStampLogitsProcessor
    # both unconditionally mask it).
    suppress_nots = vocab == (spec.timestamp_begin - 1)

    ts_rules = (
        suppress_ts | suppress_text | suppress_low_ts | suppress_first
        | suppress_nots
    )
    ts_rules = ts_rules & timestamps_enabled[:, None]
    # When timestamps are disabled, suppress ALL timestamp tokens and
    # <|notimestamps|> itself.
    no_ts = ~timestamps_enabled[:, None] & (is_ts | (vocab == spec.timestamp_begin - 1))
    logits = jnp.where(ts_rules | no_ts, NEG_INF, logits)

    # Probability rule: if total timestamp probability beats the best text
    # token, the sample must be a timestamp.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts, logprobs, NEG_INF), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(is_ts, NEG_INF, logprobs), axis=-1)
    force_ts = (ts_logprob > max_text) & timestamps_enabled
    logits = jnp.where(force_ts[:, None] & ~is_ts, NEG_INF, logits)
    return logits


def apply_repetition_penalty(
    logits: jax.Array,  # [B, V]
    state: SamplerState,
    penalty: jax.Array,  # [B] or scalar; 1.0 = disabled
    prompt_tokens: jax.Array | None = None,  # [B, P] left-aligned prompt ids
    prompt_len: jax.Array | None = None,  # [B] true prompt lengths
) -> jax.Array:
    """CTranslate2-style repetition penalty over the sequence so far.

    CTranslate2 penalizes every token of the target sequence, INCLUDING the
    forced prompt prefix (previous-text conditioning, sot sequence, decode
    prefix) — pass prompt_tokens/prompt_len for that parity; None penalizes
    sampled tokens only.

    The [B, V] seen-mask scatter runs under a lax.cond so the DEFAULT
    configuration (penalty == 1.0 everywhere) pays nothing per sampled
    token — the scatter was the one per-step scatter on the hot path."""
    b, v = logits.shape
    penalty = jnp.broadcast_to(jnp.asarray(penalty, jnp.float32), (b,))[:, None]

    def apply(lg):
        idx = jnp.arange(state.sampled.shape[1])[None, :]
        valid = idx < state.step
        seen = jnp.zeros((b, v), bool).at[
            jnp.arange(b)[:, None], state.sampled
        ].max(valid)
        if prompt_tokens is not None:
            pidx = jnp.arange(prompt_tokens.shape[1])[None, :]
            pvalid = pidx < prompt_len[:, None]
            seen = seen.at[jnp.arange(b)[:, None], prompt_tokens].max(pvalid)
        penalized = jnp.where(lg > 0, lg / penalty, lg * penalty)
        return jnp.where(seen & (penalty != 1.0), penalized, lg)

    return jax.lax.cond(jnp.all(penalty == 1.0), lambda lg: lg, apply, logits)


def right_align_prompt(
    prompt_tokens: jax.Array, prompt_len: jax.Array
) -> jax.Array:
    """Shift each left-aligned prompt row so its real tokens END at column P.

    Output[b, j] = prompt[b, j - (P - len_b)] for j >= P - len_b, else -1
    (-1 never equals a vocab id, so pad can't fake an n-gram match). With
    the sampled buffer concatenated after it, the result is a CONTIGUOUS
    per-item history — prompt-to-generated n-grams line up across the
    boundary despite per-item prompt lengths (lockstep: one static gather,
    loop-invariant, hoisted out of the decode while_loop)."""
    b, p = prompt_tokens.shape
    shift = (p - prompt_len)[:, None]  # [B, 1]
    src = jnp.arange(p)[None, :] - shift  # [B, P]
    out = jnp.take_along_axis(prompt_tokens, jnp.clip(src, 0, p - 1), axis=1)
    return jnp.where(src >= 0, out, -1)


def apply_no_repeat_ngram(
    logits: jax.Array,  # [B, V]
    state: SamplerState,
    n: int,  # static ngram size (0 disables; recompiles per value)
    prompt_hist: jax.Array | None = None,  # [B, P] right_align_prompt output
) -> jax.Array:
    """Ban tokens that would complete an already-seen n-gram
    (CTranslate2's no_repeat_ngram_size option).

    CTranslate2 matches n-grams over the FULL target sequence including the
    forced prompt prefix — pass `prompt_hist` (a `right_align_prompt`
    result, so prompt and sampled tokens are contiguous and boundary
    n-grams count) for that parity; None matches sampled tokens only."""
    if n <= 0:
        return logits
    b, v = logits.shape
    g = state.sampled.shape[1]
    if g < n and prompt_hist is None:
        return logits
    s = state.step
    if prompt_hist is None:
        hist = state.sampled  # [B, G]
        p = 0
        start0 = jnp.zeros((b,), jnp.int32)  # first real position per item
    else:
        hist = jnp.concatenate([prompt_hist, state.sampled], axis=1)  # [B, P+G]
        p = prompt_hist.shape[1]
        start0 = (p - jnp.sum(prompt_hist >= 0, axis=1)).astype(jnp.int32)
    h = hist.shape[1]
    if h < n:
        return logits
    end = p + s  # current sequence length inside hist (scalar, lockstep)
    # context = last n-1 tokens of the real sequence (may span the boundary)
    ctx = jax.lax.dynamic_slice_in_dim(
        hist, jnp.maximum(end - (n - 1), 0), n - 1, axis=1
    )  # [B, n-1]
    # all historical windows of length n-1 and the token that followed each
    w_start = jnp.arange(h - n + 1)
    widx = w_start[:, None] + jnp.arange(n - 1)[None, :]
    windows = hist[:, widx]  # [B, W, n-1]
    next_toks = hist[:, n - 1 :]  # [B, W]
    # a window is real iff it lies fully inside the sequence: starts at or
    # after the first real token and its follower exists before this step
    valid = (w_start[None, :] >= start0[:, None]) & (
        (w_start[None, :] + n - 1) < end
    )  # [B, W]
    match = jnp.all(windows == ctx[:, None, :], axis=-1) & valid  # [B, W]
    ban = jnp.zeros((b, v), bool).at[
        jnp.arange(b)[:, None], jnp.maximum(next_toks, 0)
    ].max(match)
    # context itself must be fully real (enough history for n-1 tokens)
    active = (end - start0) >= (n - 1)  # [B]
    return jnp.where(ban & active[:, None], NEG_INF, logits)


def sample_next(
    logits: jax.Array,  # [B, V] post-rules
    temperature: jax.Array,  # [B] — 0.0 means greedy
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Greedy/temperature sampling. Returns (next_token [B], logprob [B])."""
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    sampled = jax.random.categorical(key, logits / t, axis=-1)
    next_tok = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    lp = logprobs[jnp.arange(logits.shape[0]), next_tok]
    return next_tok, lp


def advance_state(
    spec: DecodingSpec, state: SamplerState, next_tok: jax.Array, logprob: jax.Array
) -> SamplerState:
    """Write the sampled token (uniform column) and update bookkeeping."""
    write = ~state.finished
    tok = jnp.where(write, next_tok, spec.eot)
    sampled = jax.lax.dynamic_update_slice_in_dim(
        state.sampled, tok[:, None], state.step, axis=1
    )
    is_ts = (tok >= spec.timestamp_begin) & write
    # sum_logprob includes the EOT that terminates the sequence (whisper
    # convention: avg over len(tokens)+1 incl. EOT).
    sum_logprob = state.sum_logprob + jnp.where(write, logprob, 0.0)
    gen_len = state.gen_len + write.astype(jnp.int32)
    now_finished = state.finished | (tok == spec.eot) | (
        state.prompt_len + state.step + 1 >= spec.max_length
    ) | (state.step + 1 >= state.sampled.shape[1])
    return SamplerState(
        sampled=sampled,
        step=state.step + 1,
        prompt_len=state.prompt_len,
        gen_len=gen_len,
        last_ts=jnp.where(is_ts, tok, state.last_ts),
        finished=now_finished,
        sum_logprob=sum_logprob,
    )


def build_suppress_mask(n_vocab: int, token_ids) -> jax.Array:
    """[V] bool mask from a python list of suppressed token ids."""
    import numpy as np

    mask = np.zeros((n_vocab,), bool)
    for t in token_ids:
        if 0 <= t < n_vocab:
            mask[t] = True
    return jnp.asarray(mask)
