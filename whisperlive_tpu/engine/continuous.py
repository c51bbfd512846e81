"""Decode-step-level continuous batching: windows join a RUNNING decode.

The window-level scheduler (scheduler.py) makes every stream wait for the
whole previous batch's decode to finish — at 32 streams that is the
dominant term in partial-update latency. Here the decode loop never stops:
B fixed slots step together in lockstep on the device, and new windows are
inserted into free slots at chunk boundaries (every `steps_per_chunk`
steps) while other slots are mid-generation.

This is the TPU-native answer to the reference's request-level
`BatchInferenceWorker` (whisper_live/batch_inference.py:155-187): instead
of queue-then-batch, the batch is a persistent device residency. The
TPU-critical invariants survive:

  * every KV write stays a batch-UNIFORM dynamic slice — slots at
    different generation depths share one global step counter; a slot's
    tokens live at ring offsets ((join_step + i) % ring) of a fixed ring
    region, so the write column is the same for all slots each step;
  * all shapes are static — one compiled step program, one insert program
    per insert-bucket size, zero recompiles as occupancy churns;
  * state (self-KV ring, int8 cross-KV, sampled ring) lives on device
    between dispatches; the host fetches ONE small packed status array per
    chunk (the axon relay makes per-array fetches expensive).

Fallback-temperature retries become ordinary re-inserts, so a retry no
longer stalls the other streams (the reference re-decodes the failing
sub-batch synchronously, batch_inference.py:312-384).

Word timestamps ride this path too: the slot's (content-capped, int8)
cross-KV is still device-resident at harvest, so the alignment pass runs
against it before the slot is released — same align program as the window
scheduler, specialized to the capped context.

Beam search rides this path too (beam_width=K gives each slot K
contiguous lockstep lanes: coupled beam expansion at T=0, independent
best_of sampling at T>0 retries). Not routed here (handled by the window
scheduler): no_repeat_ngram, and beam widths that do not match the slot
pool's lane count.

Speculative decoding rides this path too (draft_engine + spec_k): each
chunk iteration becomes a VERIFY ROUND — the draft proposes k tokens per
slot, the target scores [cur, d1..dk] in one windowed MXU pass, and
per-slot acceptance masks mark the rejected ring tail. Every slot
advances k+2 ring columns per round at a batch-uniform base column, so
the lockstep invariants survive; committed tokens per round = 1 +
accepted prefix. Greedy output stays token-exact vs the plain path for
ANY draft (tests/test_continuous_spec.py); the ring budget becomes
ring/(k+2) rounds per window, so low-acceptance drafts shorten the
per-window token budget rather than corrupt it.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import queue
import threading
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from whisperlive_tpu.engine.engine import (
    DecodeResult,
    TranscribeOptions,
    WhisperEngine,
    fails_quality_gates,
    _bucket,
)
from whisperlive_tpu.engine.scheduler import (
    BatchRequest,
    BatchResult,
    assemble_result,
)
from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.ops import decoding as dec
from whisperlive_tpu.ops import mel as mel_ops
from whisperlive_tpu.utils import metrics as wl_metrics

logger = logging.getLogger(__name__)

INSERT_BUCKETS = (1, 2, 4, 8)

# Active-slot DMA skipping (ops/attention.py): the lockstep step passes its
# write mask into the decode kernels so done lanes awaiting harvest and
# released slots never stream their cross-KV from HBM. Greedy pools only
# (beam lanes parent-gather across rows). WL_ACTIVE_SKIP=0 reverts to
# full reads (e.g. to A/B the saving).
_ACTIVE_SKIP = os.environ.get("WL_ACTIVE_SKIP", "1") != "0"


@dataclasses.dataclass
class _SlotInfo:
    """Host-side mirror of one device slot."""

    req: BatchRequest
    options: TranscribeOptions
    join_step: int
    temp_index: int
    language: Optional[str]
    language_prob: float
    duration: float
    submitted_at: float
    # incremental partial decoding: the FULL carried hypothesis (the
    # decoder may have seen only its tail); harvest prepends it
    prefix: tuple = ()
    # valid encoder positions (reduced-context windows mask the tail of
    # the shared cross region; word-ts alignment needs the same mask)
    cross_len: int = 0


def _ring_valid(gstep, join_step, ring: int):
    """[B, ring] bool: ring position r holds a token of step
    s_r = gstep-1 - ((gstep-1-r) mod ring); valid iff s_r >= join_step."""
    r = jnp.arange(ring)[None, :]
    s_r = (gstep - 1) - jnp.mod((gstep - 1) - r, ring)
    return (s_r >= join_step[:, None]) & (gstep > join_step)[:, None]


def _ring_col(sampled, col):
    return jax.lax.dynamic_slice_in_dim(sampled, col, 1, axis=1)[:, 0]


def apply_logit_rules_ring(
    spec: dec.DecodingSpec,
    logits: jax.Array,  # [B, V]
    sampled: jax.Array,  # [B, G] ring
    gstep: jax.Array,  # [] global step
    gen_len: jax.Array,  # [B]
    last_ts: jax.Array,  # [B]
    suppress_mask: jax.Array,  # [V]
    ts_enabled: jax.Array,  # [B]
    has_prefix: jax.Array | None = None,  # [B] bool
    pfx_last_ts: jax.Array | None = None,  # [B] bool: prefix[-1] is a ts
    pfx_penult_ts: jax.Array | None = None,  # [B] bool: prefix[-2] is a ts
) -> jax.Array:
    """The whisper logit rules of dec.apply_logit_rules, addressed through
    the continuous ring buffer (per-slot generation depths, one global
    step). Same openai semantics, same masks.

    has_prefix marks slots whose decode continues a forced token prefix
    (incremental partial decoding): their first SAMPLED token is mid-
    hypothesis, so the decode-start rules (blank/EOT suppression,
    timestamp-first, max_initial_timestamp) must not re-fire — the prefix
    already consumed them; last_ts carries the timestamp state across."""
    g = sampled.shape[1]

    first = gen_len == 0
    if has_prefix is not None:
        first = first & ~has_prefix

    last_tok = _ring_col(sampled, jnp.mod(gstep - 1, g))
    penult_tok = _ring_col(sampled, jnp.mod(gstep - 2, g))
    last_was_ts = (gen_len >= 1) & (last_tok >= spec.timestamp_begin)
    penult_was_ts = (gen_len < 2) | (penult_tok >= spec.timestamp_begin)
    if has_prefix is not None:
        # Sampling token i continues last=token i-1, penult=token i-2 of
        # the HYPOTHESIS, which crosses the forced-prefix boundary for
        # i<2: the timestamp-pairing rules (a lone ts after text forces a
        # closing ts; ts,ts forbids a third) must read the prefix tail's
        # ts-ness, not the "decode start" defaults.
        p_last = has_prefix & (
            pfx_last_ts if pfx_last_ts is not None else jnp.zeros_like(has_prefix)
        )
        p_penult = has_prefix & (
            pfx_penult_ts if pfx_penult_ts is not None else jnp.zeros_like(has_prefix)
        )
        last_was_ts = jnp.where(gen_len >= 1, last_was_ts, p_last)
        penult_was_ts = jnp.where(
            gen_len >= 2,
            penult_was_ts,
            jnp.where(
                gen_len == 1,
                jnp.where(has_prefix, p_last, penult_was_ts),
                jnp.where(has_prefix, p_penult, penult_was_ts),
            ),
        )
    return apply_logit_rules_tracked(
        spec, logits, suppress_mask, ts_enabled, first,
        last_was_ts, penult_was_ts, last_ts,
    )


def apply_logit_rules_tracked(
    spec: dec.DecodingSpec,
    logits: jax.Array,  # [B, V]
    suppress_mask: jax.Array,  # [V]
    ts_enabled: jax.Array,  # [B]
    first: jax.Array,  # [B] bool: decode-start rules fire
    last_was_ts: jax.Array,  # [B] bool: hypothesis token -1 is a timestamp
    penult_was_ts: jax.Array,  # [B] bool: hypothesis token -2 is a timestamp
    last_ts: jax.Array,  # [B] last emitted timestamp token id
) -> jax.Array:
    """The whisper logit-rule core with the sequence context supplied as
    EXPLICIT per-row state instead of ring reads. apply_logit_rules_ring
    derives (first, last/penult ts-ness) from the sampled ring; the
    speculative round program tracks them statefully — with per-slot
    acceptance holes, the last committed token is NOT at ring column
    gstep-1, so ring reads would see rejected drafts."""
    b, v = logits.shape
    vocab = jnp.arange(v)[None, :]

    logits = jnp.where(suppress_mask[None, :], dec.NEG_INF, logits)
    blank_mask = (vocab == spec.blank) | (vocab == spec.eot)
    logits = jnp.where(first[:, None] & blank_mask, dec.NEG_INF, logits)

    is_ts = vocab >= spec.timestamp_begin
    is_text = vocab < spec.eot
    suppress_ts = (last_was_ts & penult_was_ts)[:, None] & is_ts
    suppress_text = (last_was_ts & ~penult_was_ts)[:, None] & is_text

    lower = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
    has_ts = last_ts >= spec.timestamp_begin
    suppress_low_ts = has_ts[:, None] & is_ts & (vocab < lower[:, None])

    init_lim = spec.timestamp_begin + spec.max_initial_timestamp_index
    suppress_first = first[:, None] & (~is_ts | (vocab > init_lim))
    suppress_nots = vocab == (spec.timestamp_begin - 1)

    ts_rules = (
        suppress_ts | suppress_text | suppress_low_ts | suppress_first
        | suppress_nots
    ) & ts_enabled[:, None]
    no_ts = ~ts_enabled[:, None] & (is_ts | (vocab == spec.timestamp_begin - 1))
    logits = jnp.where(ts_rules | no_ts, dec.NEG_INF, logits)

    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts, logprobs, dec.NEG_INF), axis=-1)
    max_text = jnp.max(jnp.where(is_ts, dec.NEG_INF, logprobs), axis=-1)
    force_ts = (ts_logprob > max_text) & ts_enabled
    return jnp.where(force_ts[:, None] & ~is_ts, dec.NEG_INF, logits)


def apply_repetition_penalty_ring(
    logits: jax.Array,
    sampled: jax.Array,  # [B, G]
    valid: jax.Array,  # [B, G] ring validity
    penalty: jax.Array,  # [B]
    prompt_toks: jax.Array | None = None,  # [B, P] post-splice prompt ids
    prompt_len: jax.Array | None = None,  # [B]
) -> jax.Array:
    """CT2-style repetition penalty over ring + prompt region.

    The seen-mask scatters run under a lax.cond so the default config
    (penalty == 1.0 on every row) pays nothing per step — same guard as
    ops/decoding.apply_repetition_penalty on the window path."""
    b, v = logits.shape
    pcol = penalty[:, None]

    def apply(lg):
        seen = jnp.zeros((b, v), bool).at[
            jnp.arange(b)[:, None], sampled
        ].max(valid)
        if prompt_toks is not None:
            pvalid = jnp.arange(prompt_toks.shape[1])[None, :] < prompt_len[:, None]
            seen = seen.at[jnp.arange(b)[:, None], prompt_toks].max(pvalid)
        penalized = jnp.where(lg > 0, lg / pcol, lg * pcol)
        return jnp.where(seen & (pcol != 1.0), penalized, lg)

    return jax.lax.cond(jnp.all(penalty == 1.0), lambda lg: lg, apply, logits)


class ContinuousEngine:
    """Compiled insert/step programs + device-resident slot state."""

    def __init__(
        self,
        engine: WhisperEngine,
        n_slots: int = 16,
        prompt_pad: int = 64,
        ring: int = 256,
        steps_per_chunk: int = 8,
        options: TranscribeOptions | None = None,
        cross_ctx: int | None = None,
        enc_buckets: tuple[int, ...] | None = None,
        beam_width: int = 1,
        draft_engine: Optional[WhisperEngine] = None,
        spec_k: int = 4,
    ):
        self.eng = engine
        self.n_slots = n_slots
        self.prompt_pad = prompt_pad
        # Speculative continuous batching (lockstep-compatible variant of
        # engine/speculative.py): when a distil draft is attached, every
        # chunk iteration is a VERIFY ROUND — the draft proposes spec_k
        # tokens per slot, the target scores [cur, d1..dk] in one windowed
        # MXU pass, and per-slot acceptance masks mark the rejected ring
        # tail. All slots advance k+1 ring entries per round at a batch-
        # uniform write column (the lockstep invariant survives); a slot
        # commits 1 + a tokens per round (a = its accepted prefix), so ring
        # efficiency is (1 + a)/(k + 1) and decode throughput approaches
        # (1 + a) tokens per target-step-equivalent. Greedy output is
        # token-exact vs the plain continuous path by construction: every
        # committed token is the target's own rule-replayed emission.
        self.draft = draft_engine
        self.spec_k = int(spec_k) if draft_engine is not None else 0
        if draft_engine is not None:
            if not 1 <= self.spec_k <= 7:
                # k+1-token verify windows must fit the Tq<=8 int8 window
                # kernel (ops/attention.py) for the HBM saving to be real
                raise ValueError(f"spec_k must be in [1, 7], got {spec_k}")
            if beam_width != 1:
                raise ValueError(
                    "speculative continuous batching requires beam_width=1 "
                    "(beam lanes and draft lanes both multiply slot rows)"
                )
            if engine.cfg.n_vocab != draft_engine.cfg.n_vocab:
                raise ValueError(
                    "speculative draft must share the target vocabulary "
                    f"({engine.cfg.n_vocab} vs {draft_engine.cfg.n_vocab})"
                )
            for f in ("n_mels", "n_audio_ctx", "n_audio_state"):
                if getattr(engine.cfg, f) != getattr(draft_engine.cfg, f):
                    raise ValueError(
                        "speculative draft must share the target encoder "
                        f"geometry ({f}) — use a distil-family draft"
                    )
            # a verify round writes ring columns [gstep % ring, +k+1] as
            # ONE contiguous block — k+2 wide, not k+1: column 0 holds
            # cur's K/V (fed by both models this round), columns 1..a+1
            # hold the committed tokens (accepted drafts + bonus), so a
            # full-acceptance round (a == k) still stores its bonus at
            # column k+1. (k+2) | ring keeps every block inside the ring.
            kp2 = self.spec_k + 2
            ring = -(-ring // kp2) * kp2
        self.ring = ring
        self.steps_per_chunk = steps_per_chunk
        # host-side gstep advance per step() call (spec rounds consume
        # k+2 global steps each)
        self.gstep_per_chunk = steps_per_chunk * (
            self.spec_k + 2 if self.spec_k else 1
        )
        # spec-mode status additionally carries the committed-token ring
        # mask (acceptance holes make (join_step + i) % ring unrolling
        # wrong) — see _pack_status / unroll_row
        self.status_width = 6 + (2 * ring if self.spec_k else ring)
        # Lockstep beam lanes: each slot owns K contiguous state rows. At
        # T=0 the K lanes run coupled beam expansion (top-K over K*V with
        # a per-step parent gather, CTranslate2 semantics — the window
        # path's _decode_beam, engine.py); at T>0 (fallback retries) the
        # lanes sample independently and harvest keeps the best-scoring
        # lane (faster-whisper's best_of). K=1 compiles to exactly the
        # greedy program (no lane ops traced).
        self.beam_width = max(int(beam_width), 1)
        self.n_rows = n_slots * self.beam_width
        # dp x tp serving: when the engine's params are sharded over a
        # ("data", "model") mesh, the slot state's row axis shards over
        # "data" — each data-replica decodes its own slots with NO cross-
        # replica communication in the step (weights replicated over
        # "data", TP collectives ride "model"). One scheduler, one logical
        # program, dp x the slot pool.
        self.shardings = getattr(engine, "_shardings", None)
        self.dp_sharded = (
            self.shardings is not None
            and self.shardings.dp > 1
            and self.n_rows % self.shardings.dp == 0
        )
        if (
            self.shardings is not None
            and self.shardings.dp > 1
            and not self.dp_sharded
        ):
            logger.warning(
                "slot rows (%d = %d slots x %d lanes) do not divide dp=%d; "
                "slot state stays unsharded over the data axis (size the "
                "pool as a multiple of dp to use all replicas)",
                self.n_rows, n_slots, self.beam_width, self.shardings.dp,
            )
        cfg = engine.cfg
        spec = engine.spec
        self.cache_len = prompt_pad + ring
        # Content-capped cross-KV (the TRT padding-removal analogue,
        # transcriber_tensorrt.py:79-149): streaming windows are a few
        # seconds of real audio padded to 30 s, so slots keep only the
        # first cross_ctx encoder positions (cross_ctx * 0.02 s of audio).
        # Every decode step reads ALL resident cross-KV, so this directly
        # scales the dominant per-step HBM term. Windows longer than the
        # cap are routed to the window scheduler (max_window_s below).
        if cross_ctx is None:
            cross_ctx = 640 if cfg.n_audio_ctx >= 1500 else cfg.n_audio_ctx
        self.cross_ctx = min(cross_ctx, cfg.n_audio_ctx)
        self.max_window_s = self.cross_ctx * (30.0 / cfg.n_audio_ctx)
        # Reduced-context encoder buckets: a streaming tail of a few
        # seconds does not need the encoder's full 30 s context — encoding
        # 1024 mel frames (512 positions, 10.24 s) instead of 3000 is ~3x
        # less insert compute AND ~3x fewer relay-upload bytes, which is
        # the dominant stall of the lockstep step loop. Windows route to
        # the smallest bucket that holds them; per-slot `cross_len` masks
        # the unused tail of the shared cross-KV region. Only active in
        # content-capped (streaming) configs — with cross_ctx pinned to
        # the full context (parity tests) every window encodes fully.
        if enc_buckets is None:
            if self.cross_ctx < cfg.n_audio_ctx:
                env = os.environ.get("WL_ENC_BUCKETS")
                if env:
                    enc_buckets = tuple(int(x) for x in env.split(","))
                else:
                    enc_buckets = (512,)
            else:
                enc_buckets = ()
        enc_buckets = tuple(
            b for b in sorted(set(enc_buckets)) if 0 < b < cfg.n_audio_ctx
        ) + (cfg.n_audio_ctx,)
        self.enc_buckets = enc_buckets
        base_options = options or TranscribeOptions()
        self.suppress_mask = engine.suppress_mask_for(base_options)
        # the mask is baked into the step program; requests with a
        # DIFFERENT suppress configuration must route to the window
        # scheduler (backends._pick_scheduler checks this key)
        self.suppress_key = (
            base_options.suppress_tokens, base_options.suppress_blank
        )
        multilingual = engine.tokenizer.spec.multilingual
        bits = engine.cross_kv_bits

        def _quantize(cross):
            if bits == 8:
                return wmod.quantize_cross_kv(cross)
            if bits == 4:
                return wmod.quantize_cross_kv_int4(cross)
            return cross

        K = self.beam_width
        n_rows = self.n_rows
        draft = self.draft
        spec_k = self.spec_k
        cfg_d = draft.cfg if draft is not None else None
        bits_d = draft.cross_kv_bits if draft is not None else bits

        def _quantize_as(cross, b_):
            if b_ == 8:
                return wmod.quantize_cross_kv(cross)
            if b_ == 4:
                return wmod.quantize_cross_kv_int4(cross)
            return cross

        def _cross_template(cfg_x, bits_x, b, tcap, dtype):
            hd = cfg_x.n_text_state // cfg_x.n_text_head
            if bits_x == 8:
                return {
                    # packed head-major int8, K|V in one 128-lane row
                    # (models/whisper.py quantize_cross_kv)
                    "kv8": jnp.zeros(
                        (cfg_x.n_text_layer, 1, b, cfg_x.n_text_head,
                         tcap, 2 * hd), jnp.int8
                    ),
                    "scale": jnp.zeros(
                        (cfg_x.n_text_layer, 2, b, 1, cfg_x.n_text_head, hd),
                        jnp.bfloat16,
                    ),
                }
            if bits_x == 4:
                return {
                    "kv4": jnp.zeros(
                        (cfg_x.n_text_layer, 2, b, cfg_x.n_text_head,
                         tcap, hd // 2), jnp.int8
                    ),
                    "scale": jnp.zeros(
                        (cfg_x.n_text_layer, 2, b, 1, cfg_x.n_text_head, hd),
                        jnp.bfloat16,
                    ),
                }
            return {
                "kv": jnp.zeros(
                    (cfg_x.n_text_layer, 2, b, tcap, cfg_x.n_text_head, hd),
                    dtype,
                ),
                "scale": None,
            }

        # ---------------- state init ----------------
        def _init_state(key):
            b = n_rows
            tcap = self.cross_ctx  # content-capped (see __init__)
            cross = _cross_template(cfg, bits, b, tcap, cfg.dtype)
            if draft is not None:
                return {
                    **_base_state(key, b, cross),
                    # speculative round state: the committed-but-unfed
                    # token (next round's window position 0), the tracked
                    # rule chain (ring reads see rejected drafts), and the
                    # two validity planes — committed hypothesis tokens
                    # (harvest + repetition penalty) vs attendable K/V
                    # columns (cur's K/V is valid; the bonus's token is
                    # stored but its K/V arrives next round at column 0)
                    "cur": jnp.zeros((b,), jnp.int32),
                    "last_was_ts": jnp.zeros((b,), bool),
                    "penult_was_ts": jnp.zeros((b,), bool),
                    "tok_valid": jnp.zeros((b, ring), bool),
                    "kv_valid": jnp.zeros((b, ring), bool),
                    "d_self_kv": wmod.init_self_kv(cfg_d, b, self.cache_len),
                    "d_cross_kv": _cross_template(
                        cfg_d, bits_d, b, tcap, cfg_d.dtype
                    ),
                }
            return _base_state(key, b, cross)

        def _base_state(key, b, cross):
            return {
                "self_kv": wmod.init_self_kv(cfg, b, self.cache_len),
                "cross_kv": cross,
                "sampled": jnp.zeros((b, ring), jnp.int32),
                "logits": jnp.full((b, cfg.n_vocab), dec.NEG_INF, jnp.float32),
                # prompt token ids (post lang-splice) — the repetition
                # penalty must see the full sequence incl. the prompt
                # (CTranslate2 semantics; also keeps prefix continuations
                # penalty-consistent with a from-scratch decode, where the
                # carried hypothesis sits in the ring instead)
                "prompt_toks": jnp.zeros((b, prompt_pad), jnp.int32),
                "prompt_len": jnp.zeros((b,), jnp.int32),
                "join_step": jnp.zeros((b,), jnp.int32),
                "gen_len": jnp.zeros((b,), jnp.int32),
                "last_ts": jnp.full((b,), spec.timestamp_begin - 1, jnp.int32),
                "active": jnp.zeros((b,), bool),
                "finished": jnp.zeros((b,), bool),
                "has_prefix": jnp.zeros((b,), bool),
                "pfx_last_ts": jnp.zeros((b,), bool),
                "pfx_penult_ts": jnp.zeros((b,), bool),
                "sum_logprob": jnp.zeros((b,), jnp.float32),
                "ns_prob": jnp.zeros((b,), jnp.float32),
                "temperature": jnp.zeros((b,), jnp.float32),
                "ts_enabled": jnp.ones((b,), bool),
                "rep_penalty": jnp.ones((b,), jnp.float32),
                "length_penalty": jnp.ones((b,), jnp.float32),
                "max_new": jnp.full((b,), ring - 1, jnp.int32),
                # valid encoder positions per slot (reduced-context
                # windows leave a stale tail in the shared cross region)
                "cross_len": jnp.full((b,), self.cross_ctx, jnp.int32),
                "gstep": jnp.zeros((), jnp.int32),
                "key": key,
                "status": jnp.zeros((n_rows, self.status_width), jnp.float32),
            }

        # ---------------- insert ----------------
        def _insert(
            params,
            state,
            audio,  # [j, N_SAMPLES]
            prompts,  # [j, P]
            prompt_len,  # [j]
            sot_idx,  # [j]
            lang_known,  # [j] bool
            slot_ids,  # [j] int32
            temps,  # [j]
            ts_en,  # [j] bool
            rep,  # [j]
            max_new,  # [j]
            last_ts_init,  # [j] int32 (timestamp state carried by a prefix)
            has_prefix,  # [j] bool
            pfx_last_ts,  # [j] bool
            pfx_penult_ts,  # [j] bool
            length_pen,  # [j] f32 (beam winner scoring)
            params_d=None,  # draft params (speculative mode only)
        ):
            j = audio.shape[0]
            if audio.dtype == jnp.int16:
                # PCM16 upload path (see WhisperEngine.prepare): halves the
                # relay bytes; dequant fuses into mel framing.
                audio = audio.astype(jnp.float32) * (1.0 / 32767.0)
            mel = mel_ops.log_mel_spectrogram(audio, n_mels=cfg.n_mels)
            # The encoder runs at the AUDIO BUCKET's context (short tails
            # skip most of the 30 s padding — see enc_buckets above), and
            # only the first cross_ctx positions feed the decoder (content
            # cap, the TRT padding-removal analogue). jit specializes one
            # insert program per (j, bucket) shape.
            enc = wmod.encode(params, cfg, mel)
            t_here = min(enc.shape[1], self.cross_ctx)
            enc = enc[:, :t_here]
            cross = _quantize(wmod.compute_cross_kv(params, cfg, enc))

            if multilingual:
                self_kv_d = wmod.init_self_kv(cfg, j, 8)
                sot = jnp.full((j, 1), spec.eot + 1, jnp.int32)
                ones = jnp.ones((j,), jnp.int32)
                det_logits, _ = wmod.decode_prefill(
                    params, cfg, sot, ones, self_kv_d, cross
                )
                lang_ids = jnp.asarray(engine.tokenizer.spec.all_language_tokens)
                lmask = jnp.zeros((cfg.n_vocab,), bool).at[lang_ids].set(True)
                det_logits = jnp.where(lmask[None, :], det_logits, dec.NEG_INF)
                lang_probs = jax.nn.softmax(det_logits, axis=-1)[:, lang_ids]
                detected = lang_ids[jnp.argmax(lang_probs, axis=-1)].astype(jnp.int32)
                lang_pos = jnp.clip(sot_idx + 1, 0, prompts.shape[1] - 1)
                given = prompts[jnp.arange(j), lang_pos]
                tok = jnp.where(lang_known, given, detected)
                prompts = prompts.at[jnp.arange(j), lang_pos].set(tok)
            else:
                lang_probs = jnp.zeros((j, 1), jnp.float32)

            self_kv_j = wmod.init_self_kv(cfg, j, prompt_pad)
            last_logits, sot_logits, self_kv_j = wmod.decode_prefill(
                params, cfg, prompts, prompt_len, self_kv_j, cross,
                sot_idx=sot_idx,
            )
            ns = jax.nn.softmax(sot_logits, axis=-1)[:, spec.no_speech]

            if draft is not None:
                # distil drafts share the teacher encoder: the draft
                # cross-KV projects from the SAME encoder output, so the
                # draft costs no extra encode (engine/speculative.py
                # cross_from_enc, same contract)
                cross_d = _quantize_as(
                    wmod.compute_cross_kv(params_d, cfg_d, enc), bits_d
                )
                d_kv_j = wmod.init_self_kv(cfg_d, j, prompt_pad)
                _, d_kv_j = wmod.decode_prefill(
                    params_d, cfg_d, prompts, prompt_len, d_kv_j, cross_d
                )

            zero = jnp.zeros((), jnp.int32)
            for i in range(j):
                # a slot's K beam lanes are CONTIGUOUS rows — every write
                # is one K-row block update at row0 (never per-lane, which
                # would unroll j*K scatters)
                row0 = slot_ids[i] * K
                state["self_kv"] = jax.lax.dynamic_update_slice(
                    state["self_kv"],
                    jnp.repeat(
                        jax.lax.dynamic_slice_in_dim(self_kv_j, i, 1, axis=2),
                        K, axis=2,
                    ),
                    (zero, zero, row0, zero, zero, zero),
                )
                for leaf in ("kv", "kv8", "kv4"):
                    if leaf in state["cross_kv"]:
                        upd = jnp.repeat(
                            jax.lax.dynamic_slice_in_dim(cross[leaf], i, 1, axis=2),
                            K, axis=2,
                        )
                        state["cross_kv"][leaf] = jax.lax.dynamic_update_slice_in_dim(
                            state["cross_kv"][leaf], upd, row0, axis=2
                        )
                if state["cross_kv"].get("scale") is not None:
                    upd = jnp.repeat(
                        jax.lax.dynamic_slice_in_dim(cross["scale"], i, 1, axis=2),
                        K, axis=2,
                    )
                    state["cross_kv"]["scale"] = jax.lax.dynamic_update_slice_in_dim(
                        state["cross_kv"]["scale"], upd, row0, axis=2
                    )
                state["logits"] = jax.lax.dynamic_update_slice_in_dim(
                    state["logits"],
                    jnp.repeat(last_logits[i][None], K, axis=0),
                    row0, axis=0,
                )
                state["prompt_toks"] = jax.lax.dynamic_update_slice(
                    state["prompt_toks"],
                    jnp.repeat(
                        jax.lax.dynamic_slice_in_dim(prompts, i, 1, axis=0),
                        K, axis=0,
                    ),
                    (row0, zero),
                )

                def set1(name, val, dtype=None):
                    v = jnp.asarray(val)
                    if dtype is not None:
                        v = v.astype(dtype)
                    state[name] = jax.lax.dynamic_update_slice_in_dim(
                        state[name], jnp.broadcast_to(v[None], (K,)), row0,
                        axis=0,
                    )

                set1("prompt_len", prompt_len[i])
                set1("join_step", state["gstep"])
                set1("gen_len", jnp.zeros((), jnp.int32))
                set1("last_ts", last_ts_init[i])
                set1("active", jnp.asarray(True))
                set1("finished", jnp.asarray(False))
                set1("has_prefix", has_prefix[i])
                set1("pfx_last_ts", pfx_last_ts[i])
                set1("pfx_penult_ts", pfx_penult_ts[i])
                set1("sum_logprob", jnp.zeros((), jnp.float32))
                set1("ns_prob", ns[i])
                set1("temperature", temps[i])
                set1("ts_enabled", ts_en[i])
                set1("rep_penalty", rep[i])
                set1("length_penalty", length_pen[i])
                set1("max_new", max_new[i])
                set1("cross_len", jnp.asarray(t_here, jnp.int32))
                if draft is not None:
                    state["d_self_kv"] = jax.lax.dynamic_update_slice(
                        state["d_self_kv"],
                        jnp.repeat(
                            jax.lax.dynamic_slice_in_dim(d_kv_j, i, 1, axis=2),
                            K, axis=2,
                        ),
                        (zero, zero, row0, zero, zero, zero),
                    )
                    for leaf in ("kv", "kv8", "kv4", "scale"):
                        if state["d_cross_kv"].get(leaf) is not None:
                            upd = jnp.repeat(
                                jax.lax.dynamic_slice_in_dim(
                                    cross_d[leaf], i, 1, axis=2
                                ),
                                K, axis=2,
                            )
                            state["d_cross_kv"][leaf] = (
                                jax.lax.dynamic_update_slice_in_dim(
                                    state["d_cross_kv"][leaf], upd, row0,
                                    axis=2,
                                )
                            )
                    for mname in ("tok_valid", "kv_valid"):
                        state[mname] = jax.lax.dynamic_update_slice(
                            state[mname], jnp.zeros((K, ring), bool),
                            (row0, zero),
                        )
                    set1("cur", jnp.zeros((), jnp.int32))
                    # rule-chain init: prefix rows carry the prefix tail's
                    # ts-ness; fresh rows start (False, False) — the
                    # tracked rules core supplies the gen_len<2 "missing
                    # token counts as a timestamp" convention itself
                    set1("last_was_ts", has_prefix[i] & pfx_last_ts[i])
                    set1("penult_was_ts", has_prefix[i] & pfx_penult_ts[i])
            state["status"] = _pack_status(state)
            return state, lang_probs

        def _pack_status(state):
            """Per-ROW packed status+tokens [n_rows, 6 + ring].

            Columns 0..5 (the slot's status, repeated on each of its K
            lane rows): active, all-lanes-finished, gen_len of the
            winning lane, its sum_logprob, ns_prob, winner lane index
            (best length-penalized cumulative score — CTranslate2's
            sum / len^penalty; for K=1 the slot's own row). Columns 6..
            carry THIS row's sampled ring as float32 (token ids < 2^24
            round-trip exactly), so one status fetch per tick also
            delivers every finished hypothesis — on the axon relay each
            extra device->host fetch costs a full ~30 ms round trip."""
            fin = state["finished"].reshape(n_slots, K)
            gen = state["gen_len"].reshape(n_slots, K).astype(jnp.float32)
            slp = state["sum_logprob"].reshape(n_slots, K)
            pen = state["length_penalty"].reshape(n_slots, K)
            score = slp / jnp.maximum(gen, 1.0) ** pen
            winner = jnp.argmax(score, axis=1)  # [S]
            rows = jnp.arange(n_slots)
            slot_status = jnp.stack(
                [
                    state["active"].reshape(n_slots, K)[:, 0].astype(jnp.float32),
                    jnp.all(fin, axis=1).astype(jnp.float32),
                    gen[rows, winner],
                    slp[rows, winner],
                    state["ns_prob"].reshape(n_slots, K)[:, 0],
                    winner.astype(jnp.float32),
                ],
                axis=1,
            )  # [S, 6]
            cols = [
                jnp.repeat(slot_status, K, axis=0),
                state["sampled"].astype(jnp.float32),
            ]
            if spec_k:
                # acceptance holes: harvest needs the committed-token mask
                cols.append(state["tok_valid"].astype(jnp.float32))
            return jnp.concatenate(cols, axis=1)

        # ---------------- step chunk ----------------
        def _step_chunk(params, state, k: int):
            suppress = self.suppress_mask

            def one(_, st):
                gstep = st["gstep"]
                valid = _ring_valid(gstep, st["join_step"], ring)
                filtered = apply_logit_rules_ring(
                    spec, st["logits"], st["sampled"], gstep, st["gen_len"],
                    st["last_ts"], suppress, st["ts_enabled"],
                    st["has_prefix"], st["pfx_last_ts"], st["pfx_penult_ts"],
                )
                filtered = apply_repetition_penalty_ring(
                    filtered, st["sampled"], valid, st["rep_penalty"],
                    prompt_toks=st["prompt_toks"], prompt_len=st["prompt_len"],
                )
                key, sub = jax.random.split(st["key"])

                if K == 1:
                    write = st["active"] & ~st["finished"]
                    next_tok, lp = dec.sample_next(
                        filtered, st["temperature"], sub
                    )
                    tok = jnp.where(write, next_tok, spec.eot).astype(jnp.int32)
                    new_sum = st["sum_logprob"] + jnp.where(write, lp, 0.0)
                else:
                    # A slot steps while ANY of its lanes is live.
                    act = st["active"].reshape(n_slots, K)[:, 0]
                    fin = st["finished"].reshape(n_slots, K)
                    slot_step = act & ~jnp.all(fin, axis=1)  # [S]
                    step_rows = jnp.repeat(slot_step, K)  # [R]

                    # Coupled beam expansion (T=0 slots): top-K over the
                    # K*V candidate continuations with a per-step parent
                    # gather — _decode_beam semantics (engine.py) on the
                    # ring state. Finished lanes freeze: they propose only
                    # EOT at unchanged score. The step-0 lane collapse
                    # (all lanes identical after insert) suppresses lanes
                    # > 0 so the first expansion picks K distinct tokens
                    # from lane 0.
                    v = filtered.shape[1]
                    lp_all = jax.nn.log_softmax(filtered, axis=-1)
                    eot_only = jnp.full(
                        (n_rows, v), dec.NEG_INF
                    ).at[:, spec.eot].set(0.0)
                    lp_b = jnp.where(
                        st["finished"][:, None], eot_only, lp_all
                    )
                    cand = st["sum_logprob"][:, None] + lp_b
                    lane_rank = jnp.tile(jnp.arange(K), n_slots)
                    first_expand = (st["gen_len"] == 0) & (lane_rank > 0)
                    cand = jnp.where(
                        first_expand[:, None], dec.NEG_INF, cand
                    )
                    top_scores, top_idx = jax.lax.top_k(
                        cand.reshape(n_slots, K * v), K
                    )
                    beam_parent = (
                        top_idx // v + (jnp.arange(n_slots) * K)[:, None]
                    ).reshape(n_rows)
                    beam_tok = (top_idx % v).reshape(n_rows).astype(jnp.int32)
                    beam_sum = top_scores.reshape(n_rows)

                    # Independent sampling lanes (T>0 fallback retries):
                    # faster-whisper's best_of — K samples, harvest keeps
                    # the best-scoring lane.
                    samp_tok, samp_lp = dec.sample_next(
                        filtered, st["temperature"], sub
                    )

                    use_beam = (st["temperature"] == 0.0) & step_rows
                    ident = jnp.arange(n_rows)
                    parent = jnp.where(use_beam, beam_parent, ident)
                    for name in (
                        "sampled", "gen_len", "last_ts", "finished",
                        "sum_logprob", "has_prefix", "pfx_last_ts",
                        "pfx_penult_ts",
                    ):
                        st[name] = st[name][parent]
                    st["self_kv"] = jnp.take(st["self_kv"], parent, axis=2)
                    valid = valid[parent]

                    write = step_rows & ~st["finished"]
                    tok = jnp.where(
                        write, jnp.where(use_beam, beam_tok, samp_tok),
                        spec.eot,
                    ).astype(jnp.int32)
                    # beam rows: beam_sum is the absolute cumulative score
                    # (frozen-lane rows inherit the parent's unchanged
                    # score); sampling rows accumulate their own logprob
                    new_sum = jnp.where(
                        use_beam,
                        beam_sum,
                        st["sum_logprob"] + jnp.where(write, samp_lp, 0.0),
                    )

                col = jnp.mod(gstep, ring)
                # non-writing rows (finished/inactive) must PRESERVE the
                # ring cell: once gstep wraps past ring, the uniform column
                # lands back inside a finished slot's hypothesis, and an
                # unconditional EOT write would eat its leading tokens
                # before harvest (reachable at gen_len near ring-1)
                keep = _ring_col(st["sampled"], col)
                st["sampled"] = jax.lax.dynamic_update_slice_in_dim(
                    st["sampled"], jnp.where(write, tok, keep)[:, None],
                    col, axis=1,
                )
                is_ts = (tok >= spec.timestamp_begin) & write
                st["last_ts"] = jnp.where(is_ts, tok, st["last_ts"])
                st["sum_logprob"] = new_sum
                gen_after = st["gen_len"] + write.astype(jnp.int32)
                st["gen_len"] = gen_after
                newly_done = write & (
                    (tok == spec.eot)
                    | (gen_after >= st["max_new"])
                    | (st["prompt_len"] + gen_after >= spec.max_length)
                    | (gen_after >= ring - 1)
                )
                st["finished"] = st["finished"] | newly_done

                slot_w = prompt_pad + col
                pos = st["prompt_len"] + st["gen_len"] - 1
                jmask = jnp.arange(self.cache_len)[None, :]
                prompt_mask = jmask < st["prompt_len"][:, None]
                ring_mask = jnp.concatenate(
                    [jnp.zeros((n_rows, prompt_pad), bool), valid], axis=1
                )
                mask = prompt_mask | ring_mask
                logits, st["self_kv"] = wmod.decode_step_masked(
                    params, cfg, tok, pos, slot_w, mask,
                    st["self_kv"], st["cross_kv"],
                    cross_len=st["cross_len"],
                    active=write if (K == 1 and _ACTIVE_SKIP) else None,
                )
                st["logits"] = logits
                st["gstep"] = gstep + 1
                st["key"] = key
                return st

            state = jax.lax.fori_loop(0, k, one, state)
            state["status"] = _pack_status(state)
            return state

        # ---------------- speculative round chunk ----------------
        def _spec_chunk(params, params_d, state, nrounds: int):
            """nrounds verify rounds — the lockstep form of
            engine/speculative.py's loop body. Per round, every live slot:
            draft-decodes k greedy proposals, the target scores
            [cur, d1..dk] in ONE windowed MXU pass, and the sampler rules
            replay along the window; the committed tokens are the accepted
            draft prefix plus the target's bonus emission. Token-exact vs
            _step_chunk at temperature 0 by construction — every committed
            token is the target's own rule-replayed emission given the
            committed prefix; the draft only changes how many commit per
            round. Ring layout per round (k+2 contiguous columns at the
            batch-uniform base c0 = gstep % ring):

              col 0     cur's K/V (fed by both models); token stored here
                        only on the slot's FIRST round (boot)
              col 1+i   draft d_{i+1}: K/V from the verify window; token
                        valid iff accepted (i < a)
              col a+1   the bonus token (its K/V arrives NEXT round at
                        that round's col 0, when it is fed as cur)
              col k+1   bonus landing slot for full acceptance; never
                        holds valid K/V
            """
            suppress = self.suppress_mask
            kp1 = spec_k + 1
            kp2 = spec_k + 2
            eot = spec.eot
            b = n_rows
            rows = jnp.arange(b)
            jmask = jnp.arange(self.cache_len)[None, :]
            RS_FIELDS = (
                "gen_len", "last_ts", "last_was_ts", "penult_was_ts",
                "finished", "sum_logprob",
            )

            def one_round(_, st):
                gstep = st["gstep"]
                c0 = jnp.mod(gstep, ring)
                write = st["active"] & ~st["finished"]
                boot = write & (st["gen_len"] == 0)
                has_pfx = st["has_prefix"]

                def emit(rs, logits, seen, wr, key):
                    """One rule-replayed emission over TRACKED state (the
                    exact filter/sample/advance of _step_chunk's body —
                    with acceptance holes the last committed token is not
                    at ring column gstep-1, so context is stateful)."""
                    # the tracked chain starts (False, False); the ring
                    # rules' gen_len<2 "missing token is a timestamp"
                    # convention applies to fresh rows only (prefix rows
                    # carry real ts-ness through the chain)
                    penult_eff = jnp.where(
                        (rs["gen_len"] >= 2) | has_pfx,
                        rs["penult_was_ts"], True,
                    )
                    first = (rs["gen_len"] == 0) & ~has_pfx
                    filtered = apply_logit_rules_tracked(
                        spec, logits, suppress, st["ts_enabled"], first,
                        rs["last_was_ts"], penult_eff, rs["last_ts"],
                    )
                    # CT2 repetition penalty over prompt + committed +
                    # in-round path (numerically identical to the plain
                    # path's cond-guarded form: penalty 1.0 is a no-op)
                    pcol = st["rep_penalty"][:, None]
                    pen = jnp.where(
                        filtered > 0, filtered / pcol, filtered * pcol
                    )
                    filtered = jnp.where(seen & (pcol != 1.0), pen, filtered)
                    tok, lp = dec.sample_next(filtered, st["temperature"], key)
                    wr = wr & ~rs["finished"]
                    tok = jnp.where(wr, tok, eot).astype(jnp.int32)
                    gen_after = rs["gen_len"] + wr.astype(jnp.int32)
                    newly_done = wr & (
                        (tok == eot)
                        | (gen_after >= st["max_new"])
                        | (st["prompt_len"] + gen_after >= spec.max_length)
                    )
                    is_ts = (tok >= spec.timestamp_begin) & wr
                    rs2 = {
                        "gen_len": gen_after,
                        "last_ts": jnp.where(is_ts, tok, rs["last_ts"]),
                        "last_was_ts": jnp.where(
                            wr, tok >= spec.timestamp_begin,
                            rs["last_was_ts"],
                        ),
                        "penult_was_ts": jnp.where(
                            wr, rs["last_was_ts"], rs["penult_was_ts"]
                        ),
                        "finished": rs["finished"] | newly_done,
                        "sum_logprob": rs["sum_logprob"]
                        + jnp.where(wr, lp, 0.0),
                    }
                    seen2 = seen.at[rows, tok].max(wr)
                    return rs2, tok, seen2

                # seen base: prompt + committed ring tokens
                seen0 = jnp.zeros((b, cfg.n_vocab), bool).at[
                    rows[:, None], st["sampled"]
                ].max(st["tok_valid"])
                pvalid = (
                    jnp.arange(prompt_pad)[None, :]
                    < st["prompt_len"][:, None]
                )
                seen0 = seen0.at[rows[:, None], st["prompt_toks"]].max(pvalid)

                rs0 = {f: st[f] for f in RS_FIELDS}
                key, kb, kd, kv = jax.random.split(st["key"], 4)
                # boot: a freshly inserted slot's first token comes from
                # its prefill logits (the plain loop's first iteration)
                rs_b, boot_tok, seen_b = emit(rs0, st["logits"], seen0, boot, kb)
                cur = jnp.where(boot, boot_tok, st["cur"])

                base = (jmask < st["prompt_len"][:, None]) | jnp.concatenate(
                    [jnp.zeros((b, prompt_pad), bool), st["kv_valid"]],
                    axis=1,
                )

                # --- draft: k greedy proposals (k+1 steps — the extra
                # step feeds d_k so its K/V lands at col k; see
                # engine/speculative.py on the cache-hole acceptance bug)
                def dstep(carry, i):
                    drs, tok, dkv, seen, key = carry
                    key, sub = jax.random.split(key)
                    pos = st["prompt_len"] + drs["gen_len"] - 1
                    mask = base | (
                        (jmask >= prompt_pad + c0)
                        & (jmask < prompt_pad + c0 + i)
                    )
                    dlogits, dkv = wmod.decode_step_masked(
                        params_d, cfg_d, tok, pos, prompt_pad + c0 + i,
                        mask, dkv, st["d_cross_kv"],
                        cross_len=st["cross_len"],
                        active=write if _ACTIVE_SKIP else None,
                    )
                    drs, nxt, seen = emit(drs, dlogits, seen, write, sub)
                    return (drs, nxt, dkv, seen, key), nxt

                (_, _, d_kv, _, _), douts = jax.lax.scan(
                    dstep, (rs_b, cur, st["d_self_kv"], seen_b, kd),
                    jnp.arange(kp1),
                )
                st["d_self_kv"] = d_kv
                drafts = douts[:spec_k]  # [k, B]

                # --- target: verify [cur, d1..dk] in ONE pass
                win = jnp.concatenate([cur[:, None], drafts.T], axis=1)
                pos0 = st["prompt_len"] + rs_b["gen_len"] - 1
                wpos = pos0[:, None] + jnp.arange(kp1)[None, :]
                iwin = jnp.arange(kp1)[None, :, None]
                wmask = base[:, None, :] | (
                    (jmask[:, None, :] >= prompt_pad + c0)
                    & (jmask[:, None, :] <= prompt_pad + c0 + iwin)
                )
                logits_w, t_kv = wmod.decode_window_masked(
                    params, cfg, win, wpos, prompt_pad + c0, wmask,
                    st["self_kv"], st["cross_kv"],
                    cross_len=st["cross_len"],
                    active=write if _ACTIVE_SKIP else None,
                )
                st["self_kv"] = t_kv

                # --- replay the sampler rules along the draft path
                def vstep(carry, i):
                    vrs, seen, key = carry
                    key, sub = jax.random.split(key)
                    vrs2, g, seen2 = emit(vrs, logits_w[:, i], seen, write, sub)
                    return (vrs2, seen2, key), (g, vrs2)

                _, (gs, vstack) = jax.lax.scan(
                    vstep, (rs_b, seen_b, kv), jnp.arange(kp1)
                )
                # d_{i+1} accepted iff the target's rule-replayed emission
                # agrees AND the hypothesis wasn't already finished there
                acc = (gs[:-1] == drafts) & ~vstack["finished"][:-1]  # [k, B]
                a = jnp.cumprod(acc.astype(jnp.int32), axis=0).sum(axis=0)

                def take(arr):
                    return jnp.take_along_axis(arr, a[None, :], axis=0)[0]

                bonus = take(gs)
                for f in RS_FIELDS:
                    st[f] = jnp.where(write, take(vstack[f]), st[f])
                st["cur"] = jnp.where(write, bonus, st["cur"])

                # --- commit: one uniform k+2-column block write
                cidx = jnp.arange(kp2)[None, :]
                win_pad = jnp.concatenate(
                    [win, jnp.zeros((b, 1), jnp.int32)], axis=1
                )  # [B, kp2]; col k+1 only ever holds the bonus
                block_tok = jnp.where(
                    cidx == (a + 1)[:, None], bonus[:, None], win_pad
                )
                new_tbits = write[:, None] & (
                    ((cidx >= 1) & (cidx <= (a + 1)[:, None]))
                    | (boot[:, None] & (cidx == 0))
                )
                new_kbits = write[:, None] & (cidx <= a[:, None]) & (
                    cidx < kp1
                )
                old_tok = jax.lax.dynamic_slice_in_dim(
                    st["sampled"], c0, kp2, axis=1
                )
                old_tb = jax.lax.dynamic_slice_in_dim(
                    st["tok_valid"], c0, kp2, axis=1
                )
                old_kb = jax.lax.dynamic_slice_in_dim(
                    st["kv_valid"], c0, kp2, axis=1
                )
                wcol = write[:, None]
                st["sampled"] = jax.lax.dynamic_update_slice_in_dim(
                    st["sampled"], jnp.where(wcol, block_tok, old_tok),
                    c0, axis=1,
                )
                st["tok_valid"] = jax.lax.dynamic_update_slice_in_dim(
                    st["tok_valid"], jnp.where(wcol, new_tbits, old_tb),
                    c0, axis=1,
                )
                st["kv_valid"] = jax.lax.dynamic_update_slice_in_dim(
                    st["kv_valid"], jnp.where(wcol, new_kbits, old_kb),
                    c0, axis=1,
                )
                # ring-budget force finish: the NEXT round's block must
                # not clobber this slot's live columns
                st["finished"] = st["finished"] | (
                    write & (gstep + 2 * kp2 - 1 - st["join_step"] >= ring)
                )
                st["gstep"] = gstep + kp2
                st["key"] = key
                return st

            state = jax.lax.fori_loop(0, nrounds, one_round, state)
            state["status"] = _pack_status(state)
            return state

        def _release(state, mask):
            # mask: [B] bool — one static shape for ANY number of released
            # slots (an unrolled slot_ids loop would compile one program
            # per distinct done-count, each a live-loop compile stall).
            state["active"] = state["active"] & ~mask
            state["finished"] = state["finished"] & ~mask
            state["status"] = _pack_status(state)
            return state

        init_out = None
        if self.dp_sharded:
            init_out = self._state_sharding_tree(bits)
        self._init_fn = jax.jit(_init_state, out_shardings=init_out)
        self._insert_fn = jax.jit(_insert, donate_argnums=(1,))
        self._step_fn = jax.jit(_step_chunk, static_argnums=(2,), donate_argnums=(1,))
        if draft is not None:
            self._spec_fn = jax.jit(
                _spec_chunk, static_argnums=(3,), donate_argnums=(2,)
            )
        self._release_fn = jax.jit(_release, donate_argnums=(0,))
        self.state = None

    def _state_sharding_tree(self, bits: int):
        """NamedShardings for the slot state: row axis over "data", head
        axes over "model" (matching EngineShardings.kv_sharding); scalars
        and the host-fetched status replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.shardings.mesh

        def ns(*spec):
            return NamedSharding(mesh, P(*spec))

        row = ns("data")
        rep = ns()
        if bits == 8:
            cross = {
                "kv8": ns(None, None, "data", "model", None, None),
                "scale": ns(None, None, "data", None, "model", None),
            }
        elif bits == 4:
            cross = {
                "kv4": ns(None, None, "data", "model", None, None),
                "scale": ns(None, None, "data", None, "model", None),
            }
        else:
            cross = {
                "kv": ns(None, None, "data", None, "model", None),
                "scale": None,
            }
        tree = {
            "self_kv": ns(None, None, "data", None, "model", None),
            "cross_kv": cross,
            "sampled": ns("data", None),
            "prompt_toks": ns("data", None),
            "logits": ns("data", None),
            "gstep": rep,
            "key": rep,
            "status": rep,
        }
        for name in (
            "prompt_len", "join_step", "gen_len", "last_ts", "active",
            "finished", "has_prefix", "pfx_last_ts", "pfx_penult_ts",
            "sum_logprob", "ns_prob", "temperature", "ts_enabled",
            "rep_penalty", "length_penalty", "max_new", "cross_len",
        ):
            tree[name] = row
        if self.spec_k:
            bits_d = self.draft.cross_kv_bits
            if bits_d == 8:
                d_cross = {
                    "kv8": ns(None, None, "data", "model", None, None),
                    "scale": ns(None, None, "data", None, "model", None),
                }
            elif bits_d == 4:
                d_cross = {
                    "kv4": ns(None, None, "data", "model", None, None),
                    "scale": ns(None, None, "data", None, "model", None),
                }
            else:
                d_cross = {
                    "kv": ns(None, None, "data", None, "model", None),
                    "scale": None,
                }
            tree.update({
                "cur": row, "last_was_ts": row, "penult_was_ts": row,
                "tok_valid": ns("data", None), "kv_valid": ns("data", None),
                "d_self_kv": ns(None, None, "data", None, "model", None),
                "d_cross_kv": d_cross,
            })
        return tree

    # ------------------------------------------------------------------

    # Multi-host serving hook (parallel/serve_multihost.py): True on the
    # replicated-op engine, where every device op must run on EVERY host
    # (SPMD over a multi-process mesh). Gates the primary-only device ops
    # (word-ts cross-KV slice, align warmup) that would desync followers.
    multihost = False

    def _fetch(self, x, dtype=None) -> np.ndarray:
        """Device->host fetch of a state array. The multihost engine
        overrides this to first reshard to fully-replicated (a collective
        every host executes) so the primary can read cross-host shards."""
        return np.asarray(x, dtype)

    def _stage(self, x, dtype=None):
        """Host->device staging of a jit argument. The multihost engine
        overrides this to device_put replicated over the GLOBAL mesh — a
        jnp.asarray would commit to one local device, which cannot feed
        a program compiled over a multi-process mesh."""
        return jnp.asarray(x, dtype) if dtype is not None else jnp.asarray(x)

    def init_state(self, seed: int = 0) -> None:
        self.state = self._init_fn(
            self._stage(np.asarray(jax.random.PRNGKey(seed)))
        )

    def insert(
        self,
        windows: np.ndarray,  # [j, N_SAMPLES] audio
        prompts: list[list[int]],
        sot_idx: list[int],
        lang_known: list[bool],
        slot_ids: list[int],
        temps: list[float],
        ts_en: list[bool],
        rep: list[float],
        max_new: list[int],
        need_langs: bool = True,
        last_ts: Optional[list[int]] = None,
        has_prefix: Optional[list[bool]] = None,
        pfx_last_ts: Optional[list[bool]] = None,
        pfx_penult_ts: Optional[list[bool]] = None,
        enc_ctx: Optional[int] = None,
        length_penalty: Optional[list[float]] = None,
    ) -> Optional[np.ndarray]:
        """Insert j requests into the given free slots. Returns lang probs,
        or None when need_langs=False — then the call stays fully async
        (no device fetch), so the worker loop dispatches the next step
        chunk immediately instead of stalling ~an insert-program execution
        behind the relay round-trip.

        Bucket padding duplicates the LAST request's inputs AND slot id —
        the duplicate rows write identical data into that slot, so the
        write order inside the program does not matter.

        enc_ctx: encoder positions for this wave (an enc_buckets entry);
        None/full runs the trained 30 s context. Every window in the wave
        must fit (the caller groups by bucket)."""
        eng = self.eng
        j = len(slot_ids)
        bucket = _bucket(j, INSERT_BUCKETS)
        if enc_ctx is None:
            enc_ctx = eng.cfg.n_audio_ctx
        n_samples = min(enc_ctx * 2 * mel_ops.HOP_LENGTH, mel_ops.N_SAMPLES)
        audio = np.zeros((bucket, n_samples), np.float32)
        for i in range(bucket):
            src = windows[min(i, j - 1)][:n_samples]
            audio[i, : len(src)] = src
        if eng._on_tpu and os.environ.get("WL_UPLOAD_PCM16", "1") != "0":
            from whisperlive_tpu.engine.engine import _pcm16

            audio = _pcm16(audio)

        def pad(xs):
            return list(xs) + [xs[-1]] * (bucket - j)

        # Defensive boundary clamp: callers (_insert_take, warmup) trim
        # prompts to the continuous prompt region, but a future call site
        # that misses one trim rule must degrade, not fail the request.
        # Drop only HEAD tokens BEFORE the sot index (previous-text
        # conditioning — a soft prior); never cut into the sot sequence
        # itself, which would mis-anchor every position. If the steering
        # tail alone still overflows, truncate its END (forced-prefix
        # tokens) — shorter prefix, but positions stay consistent.
        prompts = list(prompts)
        sot_idx = list(sot_idx)
        for i, p in enumerate(prompts):
            if len(p) > self.prompt_pad:
                over = len(p) - self.prompt_pad
                drop = min(over, int(sot_idx[i]))
                logger.warning(
                    "insert prompt (%d) exceeds continuous prompt region "
                    "(%d); dropping %d conditioning tokens%s",
                    len(p), self.prompt_pad, drop,
                    "" if drop == over else " and truncating the tail",
                )
                p = list(p)[drop:]
                sot_idx[i] = int(sot_idx[i]) - drop
                prompts[i] = p[: self.prompt_pad]

        parr, plen = eng._pad_prompts(pad(prompts))
        # the engine's prompt BUCKETS may overshoot the region, so clamp
        # bucket padding back — only real tokens count
        if parr.shape[1] > self.prompt_pad:
            parr = parr[:, : self.prompt_pad]
        if parr.shape[1] < self.prompt_pad:
            parr = np.pad(parr, [(0, 0), (0, self.prompt_pad - parr.shape[1])])
        if last_ts is None:
            last_ts = [self.eng.spec.timestamp_begin - 1] * j
        if has_prefix is None:
            has_prefix = [False] * j
        if pfx_last_ts is None:
            pfx_last_ts = [False] * j
        if pfx_penult_ts is None:
            pfx_penult_ts = [False] * j
        if length_penalty is None:
            length_penalty = [1.0] * j

        with eng._lock:
            self.state, lang_probs = self._insert_fn(
                eng.params,
                self.state,
                self._stage(audio),
                self._stage(parr),
                self._stage(plen),
                self._stage(pad(sot_idx), jnp.int32),
                self._stage(pad(lang_known)),
                self._stage(pad(list(slot_ids)), jnp.int32),
                self._stage(pad(temps), jnp.float32),
                self._stage(pad(ts_en)),
                self._stage(pad(rep), jnp.float32),
                self._stage(pad(max_new), jnp.int32),
                self._stage(pad(list(last_ts)), jnp.int32),
                self._stage(pad(list(has_prefix))),
                self._stage(pad(list(pfx_last_ts))),
                self._stage(pad(list(pfx_penult_ts))),
                self._stage(pad(list(length_penalty)), jnp.float32),
                self.draft.params if self.draft is not None else None,
            )
        if not need_langs:
            return None
        return self._fetch(lang_probs, np.float32)[:j]

    def step(self) -> np.ndarray:
        """Run one chunk of decode steps; returns the packed per-ROW
        status+tokens array [n_rows, 6 + ring]. Columns 0..5 repeat the
        owning SLOT's status on each lane row: (active, all-lanes-
        finished, gen_len of the winning lane, its sum_logprob, ns_prob,
        winner lane index); columns 6.. are the row's sampled ring as
        float32 (exact for token ids < 2^24). One fetch delivers both
        scheduling state AND finished hypotheses — unroll the winner's
        tokens from row slot * beam_width + winner without a second
        device round trip. Slot s's status lives at row s * beam_width
        (any of its lane rows carries the same 6 columns)."""
        eng = self.eng
        with eng._lock:
            if self.spec_k:
                self.state = self._spec_fn(
                    eng.params, self.draft.params, self.state,
                    self.steps_per_chunk,
                )
            else:
                self.state = self._step_fn(
                    eng.params, self.state, self.steps_per_chunk
                )
        return self._fetch(self.state["status"], np.float32)

    def release(self, slot_ids: list[int]) -> None:
        mask = np.zeros((self.n_slots,), bool)
        mask[list(slot_ids)] = True
        rows = np.repeat(mask, self.beam_width)  # all K lanes of each slot
        with self.eng._lock:
            self.state = self._release_fn(self.state, self._stage(rows))

    def harvest_all(self) -> np.ndarray:
        """Fetch the whole sampled ring in ONE device->host roundtrip
        (per-slot fetches each pay full relay latency). [B, ring] int32."""
        return self._fetch(self.state["sampled"], np.int32)

    def align_fetch(
        self, slot: int, tokens_arr: np.ndarray, cross_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Run the word-alignment program against THIS slot's resident
        cross-KV and fetch (logits [1,T,V], attn [L,1,H,T,ctx]) to host.

        A slot-engine device op (not a bare engine call) so the multihost
        subclass can publish it through the op log: align used to run on
        the scheduler's assemble thread — a second, non-deterministically
        interleaved op stream the follower replay could not order against
        — and was therefore gated off in multi-host serving (VERDICT r4
        item 7). Dispatching it HERE, on the worker thread at harvest,
        makes its position in the op stream deterministic; only the pure-
        host DTW half (engine.align_finish) stays on the assemble pool."""
        idx = self._stage([slot * self.beam_width], jnp.int32)
        sub_cross = jax.tree.map(
            lambda a: jnp.take(a, idx, axis=2), self.state["cross_kv"]
        )
        eng = self.eng
        with eng._lock:
            logits, cross = eng._align_fn(
                eng.params, sub_cross, self._stage(tokens_arr, jnp.int32),
                self._stage([int(cross_len)], jnp.int32),
            )
        return (
            self._fetch(logits, np.float32),
            self._fetch(cross, np.float32),
        )

    def warm_align(self) -> None:
        """Compile the slot-resident align program at every prompt bucket
        (same rationale as WhisperEngine._warm_align, but through the
        align_fetch op so multihost followers replay the warmup too)."""
        if os.environ.get("WL_WARM_ALIGN", "1") == "0":
            return
        eng = self.eng
        for pmax in eng.prompt_buckets:
            n_text = max(pmax - len(eng.tokenizer.sot_sequence()) - 1, 1)
            prep = eng.align_prepare([1000 + i for i in range(n_text)])
            if prep is None:
                continue
            arr, _, _ = prep
            self.align_fetch(0, arr, self.cross_ctx)

    @staticmethod
    def unroll(row: np.ndarray, join_step: int, gen_len: int, ring: int) -> np.ndarray:
        """Ring-unroll one slot's tokens from a harvested row."""
        cols = (join_step + np.arange(gen_len)) % ring
        return row[cols]

    @staticmethod
    def unroll_masked(
        tokens: np.ndarray, valid: np.ndarray, join_step: int, ring: int
    ) -> np.ndarray:
        """Ring-unroll through the committed-token mask (speculative mode:
        acceptance holes break the contiguous (join_step + i) % ring
        addressing). Valid columns ordered by age since the slot's join —
        the force-finish budget guarantees the slot's data spans < ring
        global steps, so (col - join_step) % ring is a total order."""
        cols = np.nonzero(valid)[0]
        cols = cols[np.argsort((cols - join_step) % ring, kind="stable")]
        return tokens[cols]

    def unroll_row(self, status_row: np.ndarray, join_step: int, gen_len: int):
        """Unroll one slot's hypothesis from its packed status row
        (handles both the plain contiguous ring and the speculative
        masked ring)."""
        toks = status_row[6 : 6 + self.ring].astype(np.int32)
        if self.spec_k:
            valid = status_row[6 + self.ring :] > 0.5
            return self.unroll_masked(toks, valid, join_step, self.ring)
        return self.unroll(toks, join_step, gen_len, self.ring)

    def harvest(
        self, slot: int, join_step: int, gen_len: int, lane: int = 0
    ) -> np.ndarray:
        """Fetch one finished slot's sampled tokens (ring-unrolled). With
        beam lanes, `lane` selects the winner (status column 5)."""
        row = np.asarray(
            self.state["sampled"][slot * self.beam_width + lane], np.int32
        )
        if self.spec_k:
            valid = np.asarray(
                self.state["tok_valid"][slot * self.beam_width + lane]
            )
            return self.unroll_masked(row, valid, join_step, self.ring)
        return self.unroll(row, join_step, gen_len, self.ring)


class ContinuousScheduler:
    """Slot scheduler: drains a request queue into free device slots and
    keeps the chunked decode loop running. submit() is API-compatible with
    BatchScheduler so the serving backend can switch freely."""

    def __init__(
        self,
        engine: WhisperEngine,
        n_slots: int = 16,
        steps_per_chunk: int = 8,
        # sized so sot sequence + an incremental prefix (~150 tokens of
        # carried hypothesis) prefill in one pass; costs ~10% per-step
        # self-KV reads over the bare-prompt 64 and saves ~10x the steps
        prompt_pad: int = 192,
        # the self-KV cache (prompt_pad + ring slots) is fully re-read
        # every decode step; incremental tails sample ~8-15 tokens, so a
        # 128-slot ring cuts ~30% of the per-step HBM vs 256 and measured
        # 32-stream p50 3.3 s -> 1.7 s (BENCH_NOTES round 3). Trade-off:
        # one window can sample at most ring-1 tokens (real speech decodes
        # ~4 tok/s, so 127 covers the 12.8 s content cap with margin);
        # raise it for unusual token-dense workloads.
        ring: int = 128,
        options: TranscribeOptions | None = None,
        cross_ctx: int | None = None,
        enc_buckets: tuple[int, ...] | None = None,
        beam_width: int = 1,
        draft_engine: Optional[WhisperEngine] = None,
        spec_k: int = 4,
        cb: "ContinuousEngine | None" = None,
    ):
        self.engine = engine
        if cb is not None:
            # Injected slot engine (multi-host serving hands in a
            # MultihostContinuousEngine whose ops broadcast to follower
            # processes — parallel/serve_multihost.py); it must wrap the
            # same WhisperEngine this scheduler builds prompts with.
            if cb.eng is not engine:
                raise ValueError("injected ContinuousEngine wraps a different engine")
            self.cb = cb
        else:
            self.cb = ContinuousEngine(
                engine, n_slots=n_slots, prompt_pad=prompt_pad, ring=ring,
                steps_per_chunk=steps_per_chunk, options=options,
                cross_ctx=cross_ctx, enc_buckets=enc_buckets,
                beam_width=beam_width, draft_engine=draft_engine,
                spec_k=spec_k,
            )
        self.beam_width = self.cb.beam_width
        # routing hints for TpuBackend: windows longer than the continuous
        # cross-KV content cap — or suppress configs other than the one
        # baked into the step program — belong on the window scheduler
        self.max_window_s = self.cb.max_window_s
        self.suppress_key = self.cb.suppress_key
        self._queue: "queue.Queue[Optional[BatchRequest]]" = queue.Queue()
        self._pending: list[tuple[BatchRequest, int]] = []  # (req, temp_idx)
        # Fairness at oversubscription: slots are granted least-recently-
        # served-uid first (FIFO within a uid), so a stalled stream's
        # fallback re-inserts cannot starve newcomers. _uid_seq maps uid ->
        # global sequence number of its last granted slot.
        self._uid_seq: dict[str, int] = {}
        self._insert_seq = 0
        # Backpressure: EMA of (resident + queued) / slots, updated every
        # worker tick;
        # the serving layer turns sustained oversubscription into WAIT
        # responses for NEW connections (reference server.py:117-139).
        self._load_ema = 0.0
        self._service_ema = 1.0  # seconds per request, rough prior
        # word-timestamps assembly (alignment fetch + host DTW) runs here
        # so it never stalls the lockstep decode loop; created in start()
        # so a stop()/start() cycle gets a fresh pool
        self._assemble_pool = None
        self._slots: dict[int, _SlotInfo] = {}
        self._gstep = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # interface parity with BatchScheduler (reflects the injected
        # engine's pool when one was handed in)
        self.max_batch_size = self.cb.n_slots
        # speculative observability (host-side, cumulative): every window's
        # committed tokens vs verify rounds consumed — each round commits
        # 1 + accepted, so accepted = committed - rounds and the proposal
        # count is rounds * spec_k
        self.spec_stats = {"windows": 0, "rounds": 0, "committed": 0}
        # RECENT acceptance (EMA over harvested windows): the signal the
        # serving layer's hysteresis keys off — cumulative acceptance
        # cannot recover from a bad first minute, an EMA can
        self.acceptance_ema: float = 0.0
        self._acc_ema_n = 0
        # dispatch-cost observability (host-side, cumulative): wall time
        # the worker loop spends in each phase of a tick — insert
        # (audio upload + encode dispatch), step (decode-chunk dispatch +
        # the status fetch that syncs it), harvest (host-side unroll +
        # result assembly). Through a relay, step time = per-dispatch
        # fixed cost + chunk compute; the bench reports this split so a
        # latency floor can be attributed to code vs link.
        self.tick_stats = {
            "ticks": 0, "insert_s": 0.0, "step_s": 0.0, "harvest_s": 0.0,
            "insert_calls": 0, "insert_windows": 0,
            # length-aware roofline inputs (what the skip kernels actually
            # stream): occupied lane rows and block-padded cross positions
            # summed per tick at dispatch time (ops/attention.py block DMA
            # copies ceil(cross_len/128) 128-position blocks per active
            # row; released/empty slots stream nothing)
            "step_rows": 0, "step_cross_pos": 0,
        }

    def acceptance_rate(self) -> float:
        """Cumulative draft-acceptance fraction of the speculative
        continuous path (0.0 when not in spec mode / nothing harvested)."""
        rounds = self.spec_stats["rounds"]
        if not self.cb.spec_k or rounds == 0:
            return 0.0
        accepted = self.spec_stats["committed"] - rounds
        return max(0.0, min(1.0, accepted / (rounds * self.cb.spec_k)))

    # ------------------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        # support stop()/start() cycles: re-arm the stop flag (a stale
        # None sentinel a previous stop() left in the queue is consumed
        # and skipped by _drain_queue while the stop flag is clear)
        self._stop.clear()
        if self._assemble_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._assemble_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="wl-assemble"
            )
        if self.cb.state is None:
            self.cb.init_state()
        self._thread = threading.Thread(
            target=self._worker_loop, name="tpu-continuous-scheduler", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if self._assemble_pool is not None:
            self._assemble_pool.shutdown(wait=True)
            self._assemble_pool = None

    def submit(self, request: BatchRequest):
        self._queue.put(request)
        return request.future

    def overloaded(self, bound: float | None = None) -> bool:
        """True when sustained (resident + queued) oversubscription exceeds
        `bound` x slots — the serving layer's signal to WAIT new
        connections instead of letting every session's cadence collapse
        (reference capacity behavior, server.py:117-139). The EMA means a
        momentary burst does not trip it."""
        if bound is None:
            bound = float(os.environ.get("WL_OVERLOAD_FACTOR", "3.0"))
        return self._load_ema > bound

    def estimated_wait_s(self) -> float:
        """Rough head-of-queue wait: queued requests cycling through the
        slot pool at the observed per-request service time."""
        return (
            len(self._pending) * self._service_ema / max(self.cb.n_slots, 1)
        )

    def load_factor(self) -> float:
        """Sustained (resident + queued) / slots. >1 means requests queue;
        the serving layer's adaptive-cadence policy keys off this."""
        return self._load_ema

    def warmup(self) -> None:
        """Compile the insert buckets and the step program."""
        eng = self.engine
        if self.cb.state is None:
            self.cb.init_state()
        opts = TranscribeOptions()
        prompt, sot = eng.build_prompt(opts, language="en")
        # compile up to the bucket n_slots ROUNDS UP to, not n_slots
        # itself: a wave of n_slots=3 inserts pads to the j=4 program
        max_bucket = _bucket(self.cb.n_slots, INSERT_BUCKETS)
        for enc_ctx in self.cb.enc_buckets:
            for j in INSERT_BUCKETS:
                if j > max_bucket:
                    continue
                slots = [min(i, self.cb.n_slots - 1) for i in range(j)]
                self.cb.insert(
                    np.zeros((j, mel_ops.N_SAMPLES), np.float32),
                    [prompt] * j, [sot] * j, [True] * j,
                    slots, [0.0] * j, [True] * j, [1.0] * j,
                    [8] * j, enc_ctx=enc_ctx,
                )
                self._gstep = self._gstep  # unchanged by inserts
        self.cb.step()
        # the mask-based release program: one shape covers every done-count
        self.cb.release([0])
        # word-timestamps sessions align against the slot's content-capped
        # cross-KV: a separate specialization of the align program (ctx =
        # cross_ctx, not the window path's full context) — warm it at every
        # prompt bucket a real hypothesis can hit. Goes through the slot
        # engine's align_fetch op so multi-host followers replay it too.
        try:
            self.cb.warm_align()
        except Exception:
            logger.exception("continuous align warmup failed")
        # fresh state for serving (warmup slots held dummy data)
        self.cb.init_state()
        self._gstep = 0
        logger.info("continuous scheduler warmup complete")

    # ------------------------------------------------------------------

    def _drain_queue(self, block: bool) -> bool:
        """Move queued requests into the pending list. A None sentinel
        (enqueued by stop()) ends the drain when the stop flag is set;
        a STALE sentinel from a previous stop()/start() cycle is consumed
        and skipped so requests behind it still drain this pass."""
        got = False
        try:
            timeout = 0.05 if block else 0.0
            while True:
                req = self._queue.get(block=block and not got, timeout=timeout)
                if req is None:
                    if self._stop.is_set():
                        return got
                    continue
                self._pending.append((req, 0))
                got = True
                block = False
        except queue.Empty:
            return got

    def _do_inserts(self) -> None:
        free = [
            b for b in range(self.cb.n_slots) if b not in self._slots
        ]
        if not free or not self._pending:
            return
        # Insert granularity: one j=8 insert encodes 8 windows in a single
        # ~500 ms device pass that stalls the step loop; smaller buckets
        # interleave steps between encodes (worse encode efficiency,
        # smoother step cadence). 8 measured best for p50 on the dev chip.
        insert_max = int(os.environ.get("WL_INSERT_MAX", "0")) or max(INSERT_BUCKETS)
        insert_max = min(insert_max, max(INSERT_BUCKETS))
        k = min(len(free), insert_max)
        # Least-recently-served-uid first (stable: FIFO within a uid and
        # between equally-stale uids) — at oversubscription a cycling
        # stream's re-submits cannot starve a newcomer.
        order = sorted(
            range(len(self._pending)),
            key=lambda i: self._uid_seq.get(self._pending[i][0].uid, -1),
        )
        chosen = sorted(order[:k])  # wave keeps arrival order
        take = [self._pending[i] for i in chosen]
        picked = set(chosen)
        self._pending = [
            p for i, p in enumerate(self._pending) if i not in picked
        ]
        for req, _ in take:
            self._uid_seq[req.uid] = self._insert_seq
        self._insert_seq += 1
        self._rebind_audio(take)
        if len(self._uid_seq) > 4096:  # bound stale-uid growth
            cut = sorted(self._uid_seq.values())[len(self._uid_seq) // 2]
            self._uid_seq = {
                u: s for u, s in self._uid_seq.items() if s >= cut
            }
        # Group the wave by encoder-context bucket (short tails encode at
        # a reduced context — see enc_buckets): each group is one insert
        # program; groups keep FIFO order within themselves.
        groups: dict[int, list] = {}
        for item in take:
            groups.setdefault(self._enc_bucket_for(item[0]), []).append(item)
        for enc_ctx, group in groups.items():
            g_free, free = free[: len(group)], free[len(group):]
            try:
                self._insert_take(group, g_free, enc_ctx=enc_ctx)
                self.tick_stats["insert_calls"] += 1
                self.tick_stats["insert_windows"] += len(group)
            except Exception as e:
                # the taken requests are no longer in _pending and not yet
                # in _slots — the worker-loop catch-all cannot see them, so
                # fail their futures HERE or clients block until timeout
                logger.exception("insert failed; failing %d requests", len(group))
                wl_metrics.track_error("continuous_insert")
                for req, _ in group:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _rebind_audio(self, take) -> None:
        """Late-bind queued requests to their stream's CURRENT tail.

        At oversubscription a request waits in _pending for seconds; its
        submit-time audio snapshot is that stale by grant time, and the
        published partial would lag real time by queue-wait + decode. The
        session loop is blocked awaiting this request (the anchor cannot
        move), so swapping in the freshly buffered tail — same window
        start, more audio — yields a strictly fresher result for the same
        device work. Runs BEFORE encoder-bucket grouping so the refreshed
        length picks the right reduced-context bucket; the fresh tail is
        clamped to the continuous content cap (max_window_s) the request
        was routed under. First-attempt only: gate-retry re-inserts keep
        the audio their previous attempts decoded (a retry must re-decode
        the SAME window or the temperature ladder semantics break)."""
        cap = int(self.max_window_s * mel_ops.SAMPLE_RATE)
        for req, temp_idx in take:
            if req.refresh_audio is None or temp_idx > 0 or req.audio_rebound:
                continue
            req.audio_rebound = True
            try:
                fresh = req.refresh_audio()
            except Exception:
                logger.exception("refresh_audio failed; keeping snapshot")
                continue
            if fresh is None or len(fresh) < len(req.audio):
                continue
            req.audio = np.asarray(fresh, np.float32)[:cap]
            req.audio_bound_at = time.monotonic()

    def _enc_bucket_for(self, req: BatchRequest) -> int:
        """Smallest encoder-context bucket holding the request's window."""
        need = -(-min(len(req.audio), mel_ops.N_SAMPLES) // (
            2 * mel_ops.HOP_LENGTH
        ))
        for b in self.cb.enc_buckets:
            if need <= b:
                return b
        return self.cb.enc_buckets[-1]

    def _insert_take(self, take, free, enc_ctx: int | None = None) -> None:
        eng = self.engine
        if enc_ctx is None:
            enc_ctx = eng.cfg.n_audio_ctx
        slot_cross_len = min(enc_ctx, self.cb.cross_ctx)
        ts_begin = eng.spec.timestamp_begin
        windows, prompts, sots, lk, slot_ids = [], [], [], [], []
        temps, ts_en, rep, max_new, infos = [], [], [], [], []
        last_ts_init, has_prefix = [], []
        pfx_last_ts, pfx_penult_ts = [], []
        length_pen = []
        for (req, temp_idx), slot in zip(take, free):
            opt = req.options
            a = req.audio[: mel_ops.N_SAMPLES]
            buf = np.zeros(mel_ops.N_SAMPLES, np.float32)
            buf[: len(a)] = a
            lang = req.language or opt.language
            # Incremental partial decoding: continue the previous window's
            # hypothesis (prefilled on the MXU in this insert) and sample
            # only the new tail tokens. A user-supplied text prefix
            # (opt.prefix) takes precedence; retries arrive prefix-less.
            prefix = tuple(req.prefix_tokens) if not opt.prefix else ()
            if prefix:
                # the prefix gets the prompt-region room first; previous-
                # text conditioning keeps whatever is left over
                p, s = eng.build_prompt(opt, language=lang or "en")
                room = self.cb.prompt_pad - len(p)
                if len(prefix) > room:
                    # A truncated prefix would shift the continued tokens'
                    # absolute positions (learned positional embeddings)
                    # vs a from-scratch decode, silently breaking the
                    # token-exact continuation invariant — decode from
                    # scratch instead (the else-branch below rebuilds the
                    # prompt with previous-token conditioning). Bounded in
                    # practice: hypotheses longer than prompt_pad -
                    # len(sot) are rare (the session layer commits and
                    # trims long tails).
                    prefix = ()
                else:
                    spare = room - len(prefix)
                    if spare >= 8 and req.previous_tokens:
                        prev = tuple(req.previous_tokens)[-(spare - 1):]
                        p2, s2 = eng.build_prompt(
                            opt, previous_tokens=prev, language=lang or "en"
                        )
                        if len(p2) + len(prefix) <= self.cb.prompt_pad:
                            p, s = p2, s2
                    # the decoder prefills the ENTIRE prefix (it fits),
                    # so continuation positions match a from-scratch run
                    p = p + [int(t) for t in prefix]
            if not prefix:
                p, s = eng.build_prompt(
                    opt, previous_tokens=req.previous_tokens,
                    language=lang or "en",
                )
                if len(p) > self.cb.prompt_pad:
                    # trim the previous-text conditioning first (a soft
                    # prior). build_prompt RE-ADDS initial_prompt/hotwords
                    # whenever previous_tokens is empty, so the rebuild can
                    # still overflow — then drop HEAD tokens before the sot
                    # index (never tail-cut: that would strip the sot
                    # sequence and leave sot_idx past the prompt end)
                    keep = max(self.cb.prompt_pad - (len(p) - len(req.previous_tokens)) - 1, 0)
                    p, s = eng.build_prompt(
                        opt,
                        previous_tokens=tuple(req.previous_tokens)[-keep:] if keep else (),
                        language=lang or "en",
                    )
                    if len(p) > self.cb.prompt_pad:
                        drop = min(len(p) - self.cb.prompt_pad, s)
                        p = p[drop:]
                        s -= drop
                        # last resort: the steering tail alone overflows —
                        # truncate its end; positions stay consistent
                        p = p[: self.cb.prompt_pad]
            windows.append(buf)
            prompts.append(p)
            sots.append(s)
            lk.append(lang is not None)
            slot_ids.append(slot)
            temps.append(opt.temperatures[min(temp_idx, len(opt.temperatures) - 1)])
            ts_en.append(not opt.without_timestamps)
            rep.append(opt.repetition_penalty)
            length_pen.append(opt.length_penalty)
            budget = self.cb.ring - 1
            if opt.max_new_tokens is not None:
                cap = opt.max_new_tokens
                if prefix:
                    # the prefix counts toward the window budget; keep a
                    # small sampling floor so the decode can extend it
                    cap = max(8, cap - len(prefix))
                budget = min(budget, cap)
            max_new.append(budget)
            lts = ts_begin - 1
            for t in reversed(prefix):
                if t >= ts_begin:
                    lts = int(t)
                    break
            last_ts_init.append(lts)
            has_prefix.append(bool(prefix))
            pfx_last_ts.append(
                bool(prefix) and prefix[-1] >= ts_begin
            )
            # missing penultimate counts as a timestamp (the gen_len<2
            # convention of the ring rules), so a 1-token prefix matches
            # the from-scratch decode's state at hypothesis index 1
            pfx_penult_ts.append(
                bool(prefix) and (len(prefix) < 2 or prefix[-2] >= ts_begin)
            )
            infos.append(
                _SlotInfo(
                    req=req, options=opt, join_step=self._gstep,
                    temp_index=temp_idx, language=lang, language_prob=1.0,
                    duration=len(a) / mel_ops.SAMPLE_RATE,
                    submitted_at=req.submitted_at,
                    prefix=prefix,
                    cross_len=slot_cross_len,
                )
            )
            if logger.isEnabledFor(logging.DEBUG):
                logger.debug(
                    "cb insert slot=%d uid=%s prefix=%d budget=%d prompt=%d",
                    slot, req.uid, len(prefix), max_new[-1], len(p),
                )
        need_langs = eng.tokenizer.spec.multilingual and any(
            info.language is None for info in infos
        )
        lang_probs = self.cb.insert(
            np.stack(windows), prompts, sots, lk, slot_ids,
            temps, ts_en, rep, max_new, need_langs=need_langs,
            last_ts=last_ts_init, has_prefix=has_prefix,
            pfx_last_ts=pfx_last_ts, pfx_penult_ts=pfx_penult_ts,
            enc_ctx=enc_ctx, length_penalty=length_pen,
        )
        codes = eng.tokenizer.spec.language_codes
        for i, (info, slot) in enumerate(zip(infos, slot_ids)):
            if info.language is None and lang_probs is not None:
                li = int(np.argmax(lang_probs[i]))
                info.language = codes[li]
                info.language_prob = float(lang_probs[i][li])
            elif info.language is None:
                info.language = "en"
            self._slots[slot] = info

    def _harvest(self, status: np.ndarray) -> None:
        """status: the packed [n_rows, 6+ring] array from step() — slot
        fields at row slot*K, the winner's tokens in its own row's tail
        columns. NO device fetch happens here: everything a harvest needs
        rode the one status fetch (each extra fetch costs a full relay
        round trip)."""
        eng = self.engine
        K = self.cb.beam_width
        done_slots = [
            b for b, info in list(self._slots.items())
            if status[b * K, 0] > 0.5 and status[b * K, 1] > 0.5
        ]
        if not done_slots:
            return
        for b in done_slots:
            info = self._slots.pop(b)
            gen_len = int(status[b * K, 2])
            sum_lp = float(status[b * K, 3])
            ns_prob = float(status[b * K, 4])
            # winning beam lane (status col 5; 0 when beam_width == 1)
            row = b * K + int(status[b * K, 5])
            if self.cb.spec_k:
                # measured acceptance: committed tokens vs verify rounds
                # (each round writes a k+2-column block from the join base;
                # the last committed column's age names the final round)
                valid = status[row, 6 + self.cb.ring:] > 0.5
                ages = (
                    np.nonzero(valid)[0] - info.join_step
                ) % self.cb.ring
                if ages.size:
                    rounds = int(ages.max()) // (self.cb.spec_k + 2) + 1
                    self.spec_stats["windows"] += 1
                    self.spec_stats["rounds"] += rounds
                    self.spec_stats["committed"] += int(valid.sum())
                    win_acc = max(
                        0.0,
                        (int(valid.sum()) - rounds)
                        / (rounds * self.cb.spec_k),
                    )
                    # seed the EMA with the first window, then track at 0.1
                    self._acc_ema_n += 1
                    if self._acc_ema_n == 1:
                        self.acceptance_ema = win_acc
                    else:
                        self.acceptance_ema += 0.1 * (
                            win_acc - self.acceptance_ema
                        )
                    wl_metrics.track_speculative_window(self.acceptance_rate())
            toks = self.cb.unroll_row(status[row], info.join_step, gen_len)
            if info.prefix:
                toks = np.concatenate(
                    [np.asarray(info.prefix, np.int32), toks]
                )
            toks = toks[toks != eng.spec.eot]
            text = eng.tokenizer.decode([int(t) for t in toks])
            from whisperlive_tpu.engine.engine import compression_ratio

            res = DecodeResult(
                tokens=toks,
                # NOTE: for prefix continuations this is a TAIL-ONLY
                # average — sum_lp covers only the newly sampled tokens
                # (the forced prefix was prefilled, not scored), divided
                # by the sampled count. The full-hypothesis average the
                # reference computes would need a scoring pass over the
                # prefix; tail-only is the honest per-update quantity.
                avg_logprob=sum_lp / max(gen_len, 1),
                no_speech_prob=ns_prob,
                compression_ratio=compression_ratio(text),
                temperature=info.options.temperatures[
                    min(info.temp_index, len(info.options.temperatures) - 1)
                ],
            )
            opt = info.options
            gate_opt = opt
            if (
                info.prefix
                and gen_len < 12
                and opt.log_prob_threshold is not None
            ):
                # A tail-only avg_logprob over a handful of sampled tokens
                # is too noisy for the quality gate: one low-probability
                # word would trigger a spurious prefix-drop retry. Skip the
                # log-prob gate below 12 sampled tokens — the from-scratch
                # retry path and the periodic WL_PREFIX_REFRESH full
                # re-decode already bound hypothesis lock-in; compression
                # ratio (full-hypothesis text) still gates.
                gate_opt = dataclasses.replace(opt, log_prob_threshold=None)
            final_failed = fails_quality_gates(gate_opt, res)
            if final_failed:
                if info.prefix:
                    # the carried hypothesis may be what failed the gates:
                    # retry from scratch at the SAME temperature first
                    info.req.prefix_tokens = ()
                    self._pending.append((info.req, info.temp_index))
                    continue
                if info.temp_index + 1 < len(opt.temperatures):
                    # retry at the next temperature: just another insert
                    self._pending.append((info.req, info.temp_index + 1))
                    continue
            if info.options.word_timestamps and not self.cb.multihost:
                # Word alignment fetches the [L,H,T,ctx] cross-attention
                # maps over the relay and runs host DTW — hundreds of ms
                # that must NOT stall the shared lockstep loop. Slice the
                # slot's cross-KV NOW (a fresh device buffer, immune to
                # the state donation of the next step dispatch — so the
                # slot can be released immediately) and hand the heavy
                # part (align dispatch + fetch + DTW) to the assemble
                # thread.
                idx = jnp.asarray([b * self.cb.beam_width])  # lanes share cross
                sub_cross = jax.tree.map(
                    lambda a: jnp.take(a, idx, axis=2),
                    self.cb.state["cross_kv"],
                )
                self._assemble_pool.submit(
                    self._assemble_and_resolve, info, res, sub_cross,
                    final_failed,
                )
                continue
            if info.options.word_timestamps and self.cb.multihost:
                # Multi-host: assemble-thread DEVICE ops would interleave
                # non-deterministically with the lockstep loop and desync
                # the follower op replay — so the align program dispatch
                # and fetch run HERE (deterministic op-stream position,
                # published via align_fetch); only the pure-host DTW half
                # goes to the assemble pool. Costs the worker loop one
                # align dispatch per word-ts harvest.
                fetched = None
                try:
                    prep = self.engine.align_prepare(
                        res.tokens, language=info.language,
                        task=info.options.task,
                    )
                    if prep is not None:
                        arr, sot_len, text_toks = prep
                        logits, cross = self.cb.align_fetch(
                            b, arr, info.cross_len or self.cb.cross_ctx
                        )
                        fetched = (logits, cross, text_toks, sot_len)
                except Exception:
                    logger.exception("multihost align dispatch failed")
                self._assemble_pool.submit(
                    self._assemble_resolve_fetched, info, res, fetched,
                    final_failed,
                )
                continue
            self._assemble_and_resolve(info, res, None, final_failed)
        self.cb.release(done_slots)

    def _assemble_and_resolve(
        self, info: _SlotInfo, res: DecodeResult, sub_cross, final_failed: bool
    ) -> None:
        """Build the BatchResult and resolve the request future. Runs on
        the worker thread for plain decodes, on the assemble pool for
        word-timestamps decodes (alignment fetch + DTW are slow)."""
        try:
            result = assemble_result(
                self.engine, info.req, res, info.duration,
                language=info.language or "en",
                language_prob=info.language_prob,
                cross_kv=sub_cross,
                item_index=0,
                prefix_ok=not final_failed,
                cross_len=info.cross_len or None,
            )
            if not info.req.future.done():
                info.req.future.set_result(result)
            service_s = time.monotonic() - info.submitted_at
            self._service_ema += 0.1 * (service_s - self._service_ema)
            wl_metrics.track_transcription(service_s, info.duration)
        except Exception as e:
            if not info.req.future.done():
                info.req.future.set_exception(e)

    def _assemble_resolve_fetched(
        self, info: _SlotInfo, res: DecodeResult, fetched, final_failed: bool
    ) -> None:
        """Multi-host word-ts assembly: the align program already ran on
        the worker thread (deterministic op-stream position); here only
        the pure-host DTW + punctuation merge + result assembly run —
        no device ops, so this thread never perturbs the op replay."""
        timings = None
        if fetched is not None:
            logits, cross, text_toks, sot_len = fetched
            try:
                timings = self.engine.align_finish(
                    logits, cross, text_toks, sot_len,
                    num_frames=int(info.duration * 100),
                )
            except Exception:
                logger.exception("multihost align DTW failed")
        try:
            result = assemble_result(
                self.engine, info.req, res, info.duration,
                language=info.language or "en",
                language_prob=info.language_prob,
                timings=timings,
                prefix_ok=not final_failed,
                cross_len=info.cross_len or None,
            )
            if not info.req.future.done():
                info.req.future.set_result(result)
            service_s = time.monotonic() - info.submitted_at
            self._service_ema += 0.1 * (service_s - self._service_ema)
            wl_metrics.track_transcription(service_s, info.duration)
        except Exception as e:
            if not info.req.future.done():
                info.req.future.set_exception(e)

    def _worker_loop(self) -> None:
        logger.info(
            "continuous scheduler started (slots=%d chunk=%d)",
            self.cb.n_slots, self.cb.steps_per_chunk,
        )
        while not self._stop.is_set():
            try:
                idle = not self._slots and not self._pending
                self._drain_queue(block=idle)
                if self._stop.is_set():
                    break
                load = (len(self._slots) + len(self._pending)) / max(
                    self.cb.n_slots, 1
                )
                self._load_ema += 0.05 * (load - self._load_ema)
                t0 = time.monotonic()
                self._do_inserts()
                t1 = time.monotonic()
                if not self._slots:
                    continue
                # roofline inputs captured at dispatch (harvest may free
                # slots): cross positions the skip kernel will stream per
                # occupied slot — block-padded cross_len under the opt-in
                # WL_BLOCK_DMA kernel, the whole slab otherwise (default;
                # chip-measured faster on the latency-bound relay)
                blk = 128
                ctx = self.cb.cross_ctx
                pad = (
                    (lambda n: -(-min(n, ctx) // blk) * blk)
                    if os.environ.get("WL_BLOCK_DMA", "0") == "1"
                    and ctx % blk == 0 and ctx > blk
                    else (lambda n: ctx)
                )
                occ_cross = [
                    pad(info.cross_len or ctx)
                    for info in self._slots.values()
                ]
                lanes = max(self.cb.n_rows // self.cb.n_slots, 1)
                status = self.cb.step()
                self._gstep += self.cb.gstep_per_chunk
                t2 = time.monotonic()
                self._harvest(status)
                t3 = time.monotonic()
                ts = self.tick_stats
                ts["ticks"] += 1
                ts["insert_s"] += t1 - t0
                ts["step_s"] += t2 - t1
                ts["harvest_s"] += t3 - t2
                ts["step_rows"] += len(occ_cross) * lanes
                ts["step_cross_pos"] += sum(occ_cross) * lanes
                if logger.isEnabledFor(logging.DEBUG):
                    logger.debug(
                        "cb tick: insert %.0fms step %.0fms harvest %.0fms "
                        "(slots=%d pending=%d)",
                        (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3,
                        len(self._slots), len(self._pending),
                    )
            except Exception as e:
                logger.exception("continuous scheduler iteration failed")
                wl_metrics.track_error("continuous_scheduler")
                # fail any requests currently resident, release all slots
                for b, info in list(self._slots.items()):
                    if not info.req.future.done():
                        info.req.future.set_exception(e)
                for req, _ in self._pending:
                    if not req.future.done():
                        req.future.set_exception(e)
                self._pending.clear()
                if self._slots:
                    try:
                        self.cb.release(list(self._slots))
                    except Exception:
                        logger.exception("slot release failed; resetting state")
                        self.cb.init_state()
                        self._gstep = 0
                self._slots.clear()
        logger.info("continuous scheduler stopped")
