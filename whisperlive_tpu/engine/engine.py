"""WhisperEngine: the single TPU inference engine behind every session.

Replaces all three reference backends (CTranslate2 / TensorRT-LLM /
OpenVINO, SURVEY §2.9-§2.11) with three jitted XLA programs per
(batch, prompt) shape bucket:

  prepare(audio)   log-mel -> encoder -> cross-attention KV   (MXU-bound)
  decode(...)      prompt prefill + full sampling loop in ONE
                   `lax.while_loop` — logit rules, temperature/greedy
                   sampling and per-item state all on-device, zero host
                   round-trips per token
  detect(...)      language identification from the encoder output

Shape-bucketing policy: batch sizes and prompt lengths are padded up to a
small static set of buckets, so a server under churn touches a handful of
compiled programs and never recompiles (the reference freely uses ragged
shapes and leans on CUDA kernels; XLA wants static shapes — SURVEY §7
"hard parts").

Temperature fallback (compression-ratio / logprob gates, mirroring
transcriber_faster_whisper.py:1350-1478 and the batched variant
batch_inference.py:312-384) is orchestrated host-side: the cross-KV of
failing items is gathered on-device and only that sub-batch is re-decoded
at the next temperature.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import threading
import zlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisperlive_tpu.engine.tokenizer import (
    TokenSpec,
    WhisperTokenizer,
    get_suppressed_tokens,
)
from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.ops import decoding as dec
from whisperlive_tpu.ops import mel as mel_ops

logger = logging.getLogger(__name__)

DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16)
DEFAULT_PROMPT_BUCKETS = (16, 64, 256)


@dataclasses.dataclass(frozen=True)
class TranscribeOptions:
    """Per-request decode options (mirrors the reference's
    TranscriptionOptions dataclass, transcriber_faster_whisper.py:60-110)."""

    language: str | None = None
    task: str = "transcribe"
    temperatures: tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: float | None = 2.4
    log_prob_threshold: float | None = -1.0
    no_speech_threshold: float | None = 0.6
    condition_on_previous_text: bool = True
    initial_prompt: str | None = None
    prefix: str | None = None
    hotwords: str | None = None
    suppress_blank: bool = True
    suppress_tokens: tuple[int, ...] | None = (-1,)
    without_timestamps: bool = False
    max_initial_timestamp: float = 1.0
    word_timestamps: bool = False
    repetition_penalty: float = 1.0
    max_new_tokens: int | None = None
    beam_size: int = 1  # >1 runs the batched beam-search program (T=0)
    # independent sampling candidates at T>0 (faster-whisper best_of=5):
    # fallback retries draw best_of hypotheses per item and keep the best
    # by average log-probability (the continuous path's lanes implement
    # the same; here the sub-batch is tiled)
    best_of: int = 5
    length_penalty: float = 1.0
    # beam patience (CTranslate2 semantics: keep searching until
    # beam_size*patience hypotheses finish). The lockstep beam keeps
    # finished hypotheses frozen in their lanes, so patience widens the
    # lane pool to ceil(beam_size*patience) — the lane-frozen analogue of
    # the collect-k*p-finished rule. patience=1.0 compiles to the exact
    # unwidened program. Window path only (continuous lanes are fixed at
    # pool construction).
    patience: float = 1.0
    no_repeat_ngram_size: int = 0
    # re-detect the language on EVERY window of the seek loop and splice
    # the detected token into that window's prompt (faster-whisper
    # `multilingual`, transcriber_faster_whisper.py:214-222 — per-segment
    # detection for code-switched audio). Ignored by English-only models.
    multilingual: bool = False
    # initial language detection (language=None): detect on up to
    # `language_detection_segments` 30 s windows, stopping early when the
    # top probability clears `language_detection_threshold`; otherwise the
    # language seen most often wins (faster-whisper detect_language,
    # transcriber_faster_whisper.py:1716-1789)
    language_detection_threshold: float | None = 0.5
    language_detection_segments: int = 1
    # seek-loop window length in seconds (< 30 shortens every window; the
    # encoder still sees a padded window — faster-whisper `chunk_length`)
    chunk_length: int | None = None
    # with word_timestamps: punctuation sets merged into neighboring words
    # (prepend attaches to the following word, append to the preceding)
    prepend_punctuations: str = "\"'“¿([{-"
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、"
    # with word_timestamps: drop anomalous (hallucination-suspect) segments
    # (streaming) / skip silence around them in the seek loop (offline,
    # transcriber_faster_whisper.py:1240-1287)
    hallucination_silence_threshold: float | None = None
    # reset the rolling prompt when fallback temperature exceeds this
    prompt_reset_on_temperature: float = 0.5
    # "s0,e0,s1,e1" or [s0, e0, ...] seconds: restrict decoding to clips
    clip_timestamps: str | tuple[float, ...] = "0"


@dataclasses.dataclass
class DecodeResult:
    """Per-item decode output (host numpy)."""

    tokens: np.ndarray  # sampled tokens, EOT stripped
    avg_logprob: float
    no_speech_prob: float
    compression_ratio: float
    temperature: float


def compression_ratio(text: str) -> float:
    """zlib compression ratio of the text — hallucination repetition gate
    (same metric as transcriber_faster_whisper.py, threshold 2.4)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _pcm16(audio: np.ndarray) -> np.ndarray:
    """float32 PCM [-1, 1] -> int16, round-to-nearest, clipped to
    +/-32767 (the device dequant divides by 32767, so the symmetric clip
    keeps full-scale samples exactly inside [-1, 1]). wl_native does it in
    one pass; the numpy fallback is ~3 passes but still far cheaper than
    shipping double the bytes through the relay."""
    try:
        import wl_native

        flat = np.ascontiguousarray(audio, np.float32)
        out = np.frombuffer(wl_native.float32_to_int16(flat), np.int16)
        return out.reshape(audio.shape)
    except Exception:
        return np.clip(np.round(audio * 32767.0), -32767, 32767).astype(
            np.int16
        )


def best_failed_attempt(
    options: TranscribeOptions, attempts: list[DecodeResult]
) -> DecodeResult:
    """Every temperature failed the gates: keep the BEST attempt, not the
    last — highest avg_logprob among below-compression-ratio results, else
    among all — stamped with the final temperature (so
    prompt_reset_on_temperature still fires), mirroring
    transcriber_faster_whisper.py:1464-1477. Single source of the policy
    for both the batched loop and the speculative single-item loop."""
    below_cr = [
        a for a in attempts
        if options.compression_ratio_threshold is None
        or a.compression_ratio <= options.compression_ratio_threshold
    ]
    best = max(below_cr or attempts, key=lambda a: a.avg_logprob)
    return dataclasses.replace(best, temperature=attempts[-1].temperature)


def _rule_statics(options: TranscribeOptions) -> tuple[bool, int]:
    """(suppress_blank, max_initial_timestamp index) as static program
    args; -1 keeps DecodingSpec's compile-time default so default options
    hit the warmed program variants unchanged."""
    sb = bool(options.suppress_blank)
    mit = -1
    if (
        options.max_initial_timestamp is not None
        and float(options.max_initial_timestamp) != 1.0
    ):
        mit = max(int(round(float(options.max_initial_timestamp) / 0.02)), 0)
    return sb, mit


def fails_quality_gates(options: TranscribeOptions, r: DecodeResult) -> bool:
    """Temperature-fallback gate (generate_with_fallback semantics,
    transcriber_faster_whisper.py:1350-1478): re-decode when the output
    fails the compression-ratio or avg-logprob checks — unless it is
    confidently silence."""
    needs = False
    if (
        options.compression_ratio_threshold is not None
        and r.compression_ratio > options.compression_ratio_threshold
    ):
        needs = True
    if (
        options.log_prob_threshold is not None
        and r.avg_logprob < options.log_prob_threshold
    ):
        needs = True
    if (
        options.no_speech_threshold is not None
        and r.no_speech_prob > options.no_speech_threshold
        and options.log_prob_threshold is not None
        and r.avg_logprob < options.log_prob_threshold
    ):
        needs = False  # silence — keep, caller skips
    return needs


class WhisperEngine:
    """Owns the params on device and the compiled program cache.

    Thread-safety: all public methods take an internal lock; in the serving
    stack only the scheduler thread calls into the engine (SURVEY §7 sketch
    item 2 — the scheduler is the single component touching the TPU).
    """

    def __init__(
        self,
        cfg: wmod.WhisperConfig,
        params: wmod.Params,
        tokenizer: WhisperTokenizer | None = None,
        compute_dtype: Any = None,
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        prompt_buckets: Sequence[int] = DEFAULT_PROMPT_BUCKETS,
        shardings: "Any | None" = None,
        decoder_int8: bool | None = None,
        cross_kv_bits: int | None = None,
    ):
        platform = jax.devices()[0].platform
        on_tpu = platform in ("tpu", "axon")
        self._on_tpu = on_tpu
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.cfg = cfg.replace(dtype=compute_dtype, fused_encoder_attention=on_tpu)
        self.tokenizer = tokenizer or WhisperTokenizer(
            TokenSpec(cfg.n_vocab, multilingual=cfg.n_vocab >= 51865)
        )
        self.spec = dec.DecodingSpec(
            n_vocab=cfg.n_vocab,
            eot=self.tokenizer.eot,
            blank=(self.tokenizer.encode(" ") or [220])[0],
            no_speech=self.tokenizer.no_speech,
            timestamp_begin=self.tokenizer.timestamp_begin,
            max_length=cfg.n_text_ctx,
        )
        self.batch_buckets = tuple(batch_buckets)
        self.prompt_buckets = tuple(p for p in prompt_buckets if p <= cfg.n_text_ctx)
        # generation-budget buckets (tokens) -> static KV cache lengths
        self.gen_buckets = (128, 256, cfg.n_text_ctx)
        self._shardings = shardings
        # Quantized cross-KV: halves (int8) or quarters (int4, opt-in) the
        # dominant decode HBM traffic term; per-channel dequant folds into
        # the attention matmuls (int4 additionally needs the Pallas unpack
        # kernel). Default int8 on TPU, full precision on CPU (tests compare
        # against f32 oracles).
        if cross_kv_bits is None:
            env_bits = os.environ.get("WL_CROSS_BITS")
            cross_kv_bits = (
                int(env_bits) if env_bits else (8 if on_tpu else 16)
            )
        assert cross_kv_bits in (4, 8, 16)
        self.cross_kv_bits = cross_kv_bits
        self.cross_kv_int8 = cross_kv_bits == 8
        if shardings is not None:
            params = jax.device_put(params, shardings.param_shardings(params))
        self.params = wmod.cast_params(params, compute_dtype)
        # Weight-only int8 decoder: the decoder re-reads all its weights per
        # sampled token (HBM-bound), so halving weight bytes ~halves step
        # time at near-lossless accuracy. Auto-on for TPU serving.
        self.decoder_int8 = on_tpu if decoder_int8 is None else decoder_int8
        if self.decoder_int8:
            self.params = wmod.quantize_decoder_weights(self.params)
        self._lock = threading.Lock()
        self._suppress_cache: dict[tuple, jax.Array] = {}
        # Preemptible beamed decodes: >0 runs beam search in bounded
        # segments of this many steps (one host sync per segment) instead
        # of one monolithic multi-second program, so latency-sensitive
        # dispatches from other threads (the continuous scheduler's ticks
        # in hybrid beam serving) interleave onto the device between
        # segments. 0 = monolithic. WL_BEAM_CHUNK (when set) wins over
        # callers that auto-enable chunking (TpuBackend hybrid mode).
        env_chunk = os.environ.get("WL_BEAM_CHUNK")
        self.beam_chunk = int(env_chunk) if env_chunk else 0
        self._beam_chunk_forced = env_chunk is not None

        cfgc = self.cfg
        spec = self.spec

        bits = self.cross_kv_bits

        def _quantize(cross):
            if bits == 8:
                return wmod.quantize_cross_kv(cross)
            if bits == 4:
                return wmod.quantize_cross_kv_int4(cross)
            return cross

        def _prepare(params, audio):
            if audio.dtype == jnp.int16:
                # PCM16 upload path: the host->device relay is the slow link
                # (~40 MB/s), so callers ship int16 (source precision) and
                # the dequant fuses into the mel framing.
                audio = audio.astype(jnp.float32) * (1.0 / 32767.0)
            melspec = mel_ops.log_mel_spectrogram(audio, n_mels=cfgc.n_mels)
            enc = wmod.encode(params, cfgc, melspec)
            return enc, _quantize(wmod.compute_cross_kv(params, cfgc, enc))

        def _prepare_mel(params, melspec):
            enc = wmod.encode(params, cfgc, melspec)
            return enc, _quantize(wmod.compute_cross_kv(params, cfgc, enc))

        def _decode(
            params,
            cross_kv,
            prompts,  # [B, P] int32, right-padded
            prompt_len,  # [B]
            sot_idx,  # [B] position of <|sot|> inside the prompt
            suppress_mask,  # [V] bool
            ts_enabled,  # [B] bool
            temperature,  # [B] f32
            rep_penalty,  # [B] f32
            max_new,  # [] int32 — cap on sampled tokens
            key,
            cache_len: int = 0,  # static: KV slots (prompt_pad + gen budget)
            no_repeat_ngram: int = 0,  # static
            suppress_blank: bool = True,  # static (default = same program)
            max_init_idx: int = -1,  # static; -1 = spec default (1.0 s)
        ):
            b, prompt_pad = prompts.shape
            sb_vec = None if suppress_blank else jnp.zeros((1,), bool)
            mit_vec = (
                None if max_init_idx < 0
                else jnp.full((1,), max_init_idx, jnp.int32)
            )
            cache_len = cache_len or cfgc.n_text_ctx
            max_gen = cache_len - prompt_pad  # static gen-slot budget
            self_kv = wmod.init_self_kv(cfgc, b, cache_len)
            state = dec.init_sampler_state(spec, prompt_len, max_gen)
            last_logits, sot_logits, self_kv = wmod.decode_prefill(
                params, cfgc, prompts, prompt_len, self_kv, cross_kv, sot_idx=sot_idx
            )
            no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, spec.no_speech]
            max_steps = jnp.minimum(max_new, max_gen)
            # CT2 parity: penalties see the full sequence incl. the prompt
            # (loop-invariant — built once, hoisted out of the while_loop)
            phist = (
                dec.right_align_prompt(prompts, prompt_len)
                if no_repeat_ngram > 0 else None
            )

            def cond(carry):
                state, *_ = carry
                return ~jnp.all(state.finished)

            def body(carry):
                state, self_kv, logits, key = carry
                key, sub = jax.random.split(key)
                filtered = dec.apply_logit_rules(
                    spec, logits, state, suppress_mask, ts_enabled,
                    suppress_blank=sb_vec, max_initial_ts_idx=mit_vec,
                )
                filtered = dec.apply_repetition_penalty(
                    filtered, state, rep_penalty,
                    prompt_tokens=prompts, prompt_len=prompt_len,
                )
                filtered = dec.apply_no_repeat_ngram(
                    filtered, state, no_repeat_ngram, prompt_hist=phist
                )
                next_tok, lp = dec.sample_next(filtered, temperature, sub)
                slot = prompt_pad + state.step  # batch-uniform cache slot
                pos = state.prompt_len + state.step  # per-item logical pos
                state = dec.advance_state(spec, state, next_tok, lp)
                state = state._replace(
                    finished=state.finished | (state.step >= max_steps)
                )
                logits, self_kv = wmod.decode_step(
                    params, cfgc, next_tok, pos, slot, prompt_len, prompt_pad,
                    self_kv, cross_kv,
                )
                return state, self_kv, logits, key

            state, _, _, _ = jax.lax.while_loop(
                cond, body, (state, self_kv, last_logits, key)
            )
            return (
                state.sampled,
                state.gen_len,
                state.sum_logprob,
                no_speech_prob,
            )

        def _beam_while(
            params,
            cross_kv,
            prompts,  # [B, P] (untiled)
            prompt_len,  # [B]
            suppress_mask,  # [V]
            ts_enabled,  # [B]
            rep_penalty,  # [B]
            max_new,  # []
            carry,  # (state@BK, self_kv@BK, logits@BK, sum_lp@BK)
            beam_size: int,  # static
            no_repeat_ngram: int,  # static
            suppress_blank: bool,  # static
            max_init_idx: int,  # static
            step_cap=None,  # [] int32 — pause the loop at this step
        ):
            """The beam-search while-loop, shared by the monolithic program
            and the chunked (preemptible) segment program. Each step expands
            BK x V candidates, keeps the top K per item, and REORDERS the
            self-KV cache by the surviving beams' parent indices (a
            batch-dim gather). Finished beams freeze their score and only
            propose EOT. Tiled invariants are rebuilt from the UNTILED
            inputs (cheap next to the loop) so the chunked carry stays
            minimal; `step_cap` bounds the loop so a multi-second beamed
            decode can yield the device to latency-sensitive dispatches
            (the continuous scheduler's ticks) between segments."""
            b, prompt_pad = prompts.shape
            k = beam_size
            bk = b * k
            max_gen = carry[1].shape[3] - prompt_pad  # self_kv [L,2,BK,C,H,hd]

            def tile(x, axis=0):
                return jnp.repeat(x, k, axis=axis)

            cross_bk = jax.tree.map(lambda a: tile(a, 2), cross_kv)
            prompt_len_bk = tile(prompt_len)
            ts_enabled_bk = tile(ts_enabled)
            rep_bk = tile(rep_penalty)

            # Kill duplicate beams at step 0 so topk picks K distinct tokens
            # from beam 0 of each item.
            beam_rank = jnp.tile(jnp.arange(k), b)  # [BK]
            dup_penalty0 = jnp.where(beam_rank == 0, 0.0, dec.NEG_INF)
            max_steps = jnp.minimum(max_new, max_gen)
            v = cfgc.n_vocab

            sb_vec = None if suppress_blank else jnp.zeros((1,), bool)
            mit_vec = (
                None if max_init_idx < 0
                else jnp.full((1,), max_init_idx, jnp.int32)
            )
            prompts_bk = tile(prompts)  # [BK, P]
            phist = (
                dec.right_align_prompt(prompts_bk, prompt_len_bk)
                if no_repeat_ngram > 0 else None
            )

            def cond(carry):
                state, *_ = carry
                go = ~jnp.all(state.finished)
                if step_cap is not None:
                    go = go & (state.step < step_cap)
                return go

            def body(carry):
                state, self_kv, logits, sum_lp = carry
                filtered = dec.apply_logit_rules(
                    spec, logits, state, suppress_mask, ts_enabled_bk,
                    suppress_blank=sb_vec, max_initial_ts_idx=mit_vec,
                )
                filtered = dec.apply_repetition_penalty(
                    filtered, state, rep_bk,
                    prompt_tokens=prompts_bk, prompt_len=prompt_len_bk,
                )
                filtered = dec.apply_no_repeat_ngram(
                    filtered, state, no_repeat_ngram, prompt_hist=phist
                )
                lp = jax.nn.log_softmax(filtered, axis=-1)  # [BK, V]
                # finished beams: freeze — only EOT with unchanged score
                eot_only = jnp.full((bk, v), dec.NEG_INF).at[:, spec.eot].set(0.0)
                lp = jnp.where(state.finished[:, None], eot_only, lp)
                cand = sum_lp[:, None] + lp  # [BK, V]
                cand = cand + jnp.where(
                    state.step == 0, dup_penalty0, 0.0
                )[:, None]
                cand = cand.reshape(b, k * v)
                top_scores, top_idx = jax.lax.top_k(cand, k)  # [B, K]
                parent = top_idx // v + (jnp.arange(b) * k)[:, None]  # [B,K] -> BK ids
                parent = parent.reshape(bk)
                next_tok = (top_idx % v).reshape(bk).astype(jnp.int32)
                new_sum = top_scores.reshape(bk)

                # Reorder per-beam state by parent.
                state = dec.SamplerState(
                    sampled=state.sampled[parent],
                    step=state.step,
                    prompt_len=state.prompt_len,
                    gen_len=state.gen_len[parent],
                    last_ts=state.last_ts[parent],
                    finished=state.finished[parent],
                    sum_logprob=state.sum_logprob[parent],
                )
                self_kv = jnp.take(self_kv, parent, axis=2)
                tok_lp = new_sum - sum_lp[parent]
                sum_lp = new_sum

                slot = prompt_pad + state.step
                pos = state.prompt_len + state.step
                state = dec.advance_state(spec, state, next_tok, tok_lp)
                state = state._replace(
                    finished=state.finished | (state.step >= max_steps)
                )
                logits, self_kv = wmod.decode_step(
                    params, cfgc, next_tok, pos, slot, prompt_len_bk, prompt_pad,
                    self_kv, cross_bk,
                )
                return state, self_kv, logits, sum_lp

            return jax.lax.while_loop(cond, body, carry)

        def _beam_prefill(params, cross_kv, prompts, prompt_len, sot_idx,
                          beam_size: int, cache_len: int):
            """Prefill at B, then tile the carry beam-major to BK."""
            b, prompt_pad = prompts.shape
            k = beam_size
            max_gen = cache_len - prompt_pad
            self_kv0 = wmod.init_self_kv(cfgc, b, cache_len)
            last_logits, sot_logits, self_kv0 = wmod.decode_prefill(
                params, cfgc, prompts, prompt_len, self_kv0, cross_kv,
                sot_idx=sot_idx,
            )
            no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, spec.no_speech]
            state = dec.init_sampler_state(
                spec, jnp.repeat(prompt_len, k), max_gen
            )
            carry = (
                state,
                jnp.repeat(self_kv0, k, axis=2),
                jnp.repeat(last_logits, k, axis=0),  # [BK, V]
                jnp.zeros((b * k,), jnp.float32),
            )
            return carry, no_speech_prob

        def _beam_best(state, sum_lp, length_penalty, beam_size: int):
            """Pick the best beam per item by length-penalized score
            (CTranslate2 convention: sum / len^penalty)."""
            bk = sum_lp.shape[0]
            b = bk // beam_size
            lengths = jnp.maximum(state.gen_len.astype(jnp.float32), 1.0)
            score = state.sum_logprob / (lengths**length_penalty)
            best = (
                jnp.argmax(score.reshape(b, beam_size), axis=1)
                + jnp.arange(b) * beam_size
            )
            return (
                state.sampled[best],
                state.gen_len[best],
                state.sum_logprob[best],
            )

        def _decode_beam(
            params,
            cross_kv,
            prompts,  # [B, P]
            prompt_len,  # [B]
            sot_idx,  # [B]
            suppress_mask,  # [V]
            ts_enabled,  # [B]
            rep_penalty,  # [B]
            max_new,  # []
            beam_size: int,  # static
            length_penalty,  # [] f32
            cache_len_: int = 0,  # static
            no_repeat_ngram: int = 0,  # static
            suppress_blank: bool = True,  # static
            max_init_idx: int = -1,  # static; -1 = spec default
        ):
            """Batched beam search in ONE device program (T=0; reference
            default beam_size=5, transcriber_faster_whisper.py:1394-1407).
            See _beam_while for the loop semantics."""
            cache_len = cache_len_ or cfgc.n_text_ctx
            carry, no_speech_prob = _beam_prefill(
                params, cross_kv, prompts, prompt_len, sot_idx,
                beam_size, cache_len,
            )
            state, _, _, sum_lp = _beam_while(
                params, cross_kv, prompts, prompt_len, suppress_mask,
                ts_enabled, rep_penalty, max_new, carry,
                beam_size, no_repeat_ngram, suppress_blank, max_init_idx,
            )
            return (*_beam_best(state, sum_lp, length_penalty, beam_size),
                    no_speech_prob)

        def _beam_start(
            params, cross_kv, prompts, prompt_len, sot_idx,
            beam_size: int,  # static
            cache_len_: int = 0,  # static
        ):
            """Chunked beam, segment 0: prefill -> initial BK carry."""
            cache_len = cache_len_ or cfgc.n_text_ctx
            return _beam_prefill(
                params, cross_kv, prompts, prompt_len, sot_idx,
                beam_size, cache_len,
            )

        def _beam_seg(
            params,
            cross_kv,
            prompts,
            prompt_len,
            suppress_mask,
            ts_enabled,
            rep_penalty,
            max_new,
            carry,
            step_cap,  # [] int32 — run until state.step reaches this
            beam_size: int,  # static
            no_repeat_ngram: int = 0,  # static
            suppress_blank: bool = True,  # static
            max_init_idx: int = -1,  # static
        ):
            """Chunked beam, one bounded segment: identical math to the
            monolithic program, paused at step_cap. Returns the carry and a
            scalar `done` so the host loop syncs on ONE boolean per segment
            — that sync point is exactly where other threads' dispatches
            (continuous ticks) interleave onto the device."""
            carry = _beam_while(
                params, cross_kv, prompts, prompt_len, suppress_mask,
                ts_enabled, rep_penalty, max_new, carry,
                beam_size, no_repeat_ngram, suppress_blank, max_init_idx,
                step_cap=step_cap,
            )
            return carry, jnp.all(carry[0].finished)

        def _beam_finish(carry, length_penalty, beam_size: int):
            state, _, _, sum_lp = carry
            return _beam_best(state, sum_lp, length_penalty, beam_size)

        def _detect(params, cross_kv):
            kv_arr = cross_kv.get("kv", cross_kv.get("kv8", cross_kv.get("kv4")))
            b = kv_arr.shape[2]
            self_kv = wmod.init_self_kv(cfgc, b)
            sot = jnp.full((b, 1), spec.eot + 1, jnp.int32)  # <|sot|>
            ones = jnp.ones((b,), jnp.int32)
            logits, _ = wmod.decode_prefill(
                params, cfgc, sot, ones, self_kv, cross_kv
            )
            lang_ids = jnp.asarray(self.tokenizer.spec.all_language_tokens)
            mask = jnp.zeros((cfgc.n_vocab,), bool).at[lang_ids].set(True)
            logits = jnp.where(mask[None, :], logits, dec.NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1)
            return probs[:, lang_ids]  # [B, num_languages]

        multilingual = self.tokenizer.spec.multilingual

        def _detect_decode(
            params,
            cross_kv,
            prompts,
            prompt_len,
            sot_idx,
            lang_known,  # [B] bool — False: detect + splice the lang token
            suppress_mask,
            ts_enabled,
            temperature,
            rep_penalty,
            max_new,
            key,
            cache_len: int = 0,
            no_repeat_ngram: int = 0,
            suppress_blank: bool = True,  # static
            max_init_idx: int = -1,  # static
        ):
            """Fused language-ID + decode in one dispatch: detects languages
            for unpinned items, splices the detected token into the prompt on
            device, then runs the sampling loop. NOTE: prepare stays a
            SEPARATE program on purpose — the program boundary is what forces
            the decode loop to stream the cross-KV as int8 (fusing them lets
            XLA hoist the dequant out of the while-loop and the reads revert
            to bf16; measured -25% throughput).
            Returns (+ lang_probs) on top of _decode's outputs."""
            b = prompts.shape[0]
            if multilingual:
                lang_probs = _detect(params, cross_kv)
                lang_ids = jnp.asarray(self.tokenizer.spec.all_language_tokens)
                detected = lang_ids[jnp.argmax(lang_probs, axis=-1)].astype(jnp.int32)
                lang_pos = jnp.clip(sot_idx + 1, 0, prompts.shape[1] - 1)
                given = prompts[jnp.arange(b), lang_pos]
                tok = jnp.where(lang_known, given, detected)
                prompts = prompts.at[jnp.arange(b), lang_pos].set(tok)
            else:
                lang_probs = jnp.zeros((b, 1), jnp.float32)
            out = _decode(
                params, cross_kv, prompts, prompt_len, sot_idx, suppress_mask,
                ts_enabled, temperature, rep_penalty, max_new, key,
                cache_len, no_repeat_ngram, suppress_blank, max_init_idx,
            )
            return (*out, lang_probs)

        def _align(params, cross_kv, tokens, cross_len):
            return wmod.decode_with_cross_attn(
                params, cfgc, tokens, cross_kv, cross_len=cross_len
            )

        self._prepare_fn = jax.jit(_prepare)
        self._prepare_mel_fn = jax.jit(_prepare_mel)
        self._decode_fn = jax.jit(_decode, static_argnums=(11, 12, 13, 14))
        self._decode_beam_fn = jax.jit(_decode_beam, static_argnums=(9, 11, 12, 13, 14))
        self._beam_start_fn = jax.jit(_beam_start, static_argnums=(5, 6))
        self._beam_seg_fn = jax.jit(_beam_seg, static_argnums=(10, 11, 12, 13))
        self._beam_finish_fn = jax.jit(_beam_finish, static_argnums=(2,))
        self._detect_decode_fn = jax.jit(_detect_decode, static_argnums=(12, 13, 14, 15))
        self._detect_fn = jax.jit(_detect)
        self._align_fn = jax.jit(_align)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def suppress_mask_for(self, options: TranscribeOptions) -> jax.Array:
        # blank suppression is a step-0 RULE (threaded as a static program
        # arg), not part of the static mask — keying on suppress_tokens
        # alone avoids duplicate identical masks
        key = options.suppress_tokens
        if key not in self._suppress_cache:
            ids = get_suppressed_tokens(self.tokenizer, options.suppress_tokens)
            self._suppress_cache[key] = dec.build_suppress_mask(self.cfg.n_vocab, ids)
        return self._suppress_cache[key]

    def build_prompt(
        self,
        options: TranscribeOptions,
        previous_tokens: Sequence[int] = (),
        language: str | None = None,
        context_preseeded: bool = False,
    ) -> tuple[list[int], int]:
        """[<|sot_prev|> prev...] + sot-sequence + prefix tokens.

        Mirrors get_prompt (transcriber_faster_whisper.py:1480-1513).
        Returns (prompt_tokens, sot_index).

        context_preseeded=True is the offline seek loop's contract: it
        seeds initial_prompt into its rolling token context itself
        (reference generate_segments 1089-1095) and implements
        condition_on_previous_text via prompt_reset_since — so here
        previous_tokens ride UNGATED and initial_prompt is never re-added
        (exactly reference get_prompt, which has no initial_prompt param).
        The serving default (False) mirrors the reference backend, which
        passes initial_prompt into EVERY per-window transcribe call
        (faster_whisper_backend.py:219,238), with the session's carried
        context additionally gated by condition_on_previous_text.
        """
        tok = self.tokenizer
        prev: list[int] = []
        if options.hotwords and not options.prefix:
            prev += tok.encode(" " + options.hotwords.strip())
        if context_preseeded:
            prev += list(previous_tokens)
        else:
            if options.initial_prompt:
                prev += tok.encode(" " + options.initial_prompt.strip())
            if previous_tokens and options.condition_on_previous_text:
                prev += list(previous_tokens)
        prev = prev[-(self.cfg.n_text_ctx // 2 - 1):]

        lang = language or options.language
        seq_tok = WhisperTokenizer(
            tok.spec, tok.backend, language=lang, task=options.task
        )
        tail = list(
            seq_tok.sot_sequence(include_timestamps=not options.without_timestamps)
        )
        if options.prefix:
            prefix_tokens = tok.encode(" " + options.prefix.strip())
            tail.extend(prefix_tokens[-(self.cfg.n_text_ctx // 2 - 1):])

        # Fit within the largest prompt bucket: the tail (sot sequence +
        # prefix) steers the decode and must survive intact, so trim the
        # previous-text conditioning first (it is a soft prior). Only then,
        # as a last resort, drop prefix tokens — loudly.
        pmax = self.prompt_buckets[-1]
        head_budget = pmax - len(tail)
        if prev and head_budget >= 2:
            prev = prev[-(head_budget - 1):]
        elif prev:
            logger.warning(
                "prompt overflow: dropping all %d previous/hotword tokens "
                "(tail alone is %d of %d slots)", len(prev), len(tail), pmax
            )
            prev = []
        if len(tail) > pmax:
            logger.warning(
                "prompt overflow: truncating prefix — prompt tail %d > "
                "largest prompt bucket %d", len(tail), pmax
            )
            tail = tail[:pmax]

        prompt: list[int] = []
        if prev:
            prompt.append(tok.sot_prev)
            prompt.extend(prev)
        sot_index = len(prompt)
        prompt.extend(tail)
        return prompt, sot_index

    def _pad_prompts(
        self, prompts: list[list[int]]
    ) -> tuple[np.ndarray, np.ndarray]:
        pmax = _bucket(max(len(p) for p in prompts), self.prompt_buckets)
        arr = np.zeros((len(prompts), pmax), np.int32)
        lens = np.zeros((len(prompts),), np.int32)
        for i, p in enumerate(prompts):
            p = p[:pmax]
            arr[i, : len(p)] = p
            lens[i] = len(p)
        return arr, lens

    def _pad_batch(self, arrays: list[np.ndarray], bucket: int) -> np.ndarray:
        out = np.zeros((bucket,) + arrays[0].shape, arrays[0].dtype)
        for i, a in enumerate(arrays):
            out[i] = a
        return out

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def warmup(
        self,
        batch_sizes: Sequence[int] | None = None,
        options: TranscribeOptions | None = None,
        detect: bool = True,
    ) -> None:
        """Compile the serving programs before traffic arrives.

        The reference warms its TensorRT engines at startup
        (trt_backend.py:101-111); here a cold XLA compile of the decode
        program can take minutes, so the server compiles prepare/detect/
        decode for the configured buckets before accepting connections.
        """
        from whisperlive_tpu.serving.backends import transcribe_options_from_session
        from whisperlive_tpu.serving.session import SessionOptions

        if options is None:
            options = transcribe_options_from_session(SessionOptions())
        if batch_sizes is None:
            batch_sizes = {self.batch_buckets[0], self.batch_buckets[-1]}
        for b in sorted(set(batch_sizes)):
            logger.info("warmup: compiling programs for batch=%d", b)
            audio = np.zeros((b, mel_ops.N_SAMPLES), np.float32)
            prompt, sot = self.build_prompt(options, language="en")
            if options.beam_size > 1:
                # beamed serving runs the SPLIT path (scheduler routes
                # beam_size>1 to prepare + detect + the beam program) —
                # warm that per bucket; the fused greedy program is warmed
                # by the detect block / a separate greedy warmup call
                _, cross = self.prepare(audio)
                if self.tokenizer.spec.multilingual:
                    self.detect_language_from_cross(cross)
                self.decode_batch(cross, [prompt] * b, [sot] * b, options)
            else:
                # the serving hot path: one fused program per batch bucket
                self.transcribe_batch(
                    audio, [prompt] * b, [sot] * b, [True] * b, options
                )
        if detect:
            # split path (word_timestamps sessions + fallback retries):
            # detect, plain decode and the alignment pass — warmed at the
            # smallest bucket so a word_timestamps client doesn't stall on
            # cold compiles (larger buckets compile on first use)
            b = sorted(set(batch_sizes))[0]
            audio = np.zeros((b, mel_ops.N_SAMPLES), np.float32)
            _, cross = self.prepare(audio)
            if self.tokenizer.spec.multilingual:
                self.detect_language_from_cross(cross)
            prompt, sot = self.build_prompt(options, language="en")
            self.decode_batch(cross, [prompt] * b, [sot] * b, options)
            try:
                self._warm_align(cross)
            except Exception:
                logger.exception("align warmup failed")
        logger.info("warmup complete")

    def _warm_align(self, cross_kv) -> None:
        """Compile the alignment pass at EVERY prompt bucket: a real
        hypothesis is 20-250 tokens, so the common case buckets to 64/256
        — a cold align compile at first word-timestamps harvest would
        stall all live streams for minutes. WL_WARM_ALIGN=0 skips."""
        if os.environ.get("WL_WARM_ALIGN", "1") == "0":
            return
        for pmax in self.prompt_buckets:
            n_text = max(pmax - len(self.tokenizer.sot_sequence()) - 1, 1)
            self.align_words(cross_kv, 0, [1000 + i for i in range(n_text)],
                             100)

    def prepare(self, audio: np.ndarray):
        """audio [B, N_SAMPLES] f32 or int16 PCM -> (enc, cross_kv) on device.

        On TPU, float32 input is converted host-side to int16 PCM before
        upload (wl_native single-pass kernel when built): the relay moves
        ~40 MB/s, so halving a 15 MB window-batch saves ~170 ms/dispatch.
        int16 is the source precision of every real PCM pipeline; set
        WL_UPLOAD_PCM16=0 to ship float32 unchanged."""
        audio = np.asarray(audio)
        if (
            audio.dtype == np.float32
            and self._on_tpu
            and os.environ.get("WL_UPLOAD_PCM16", "1") != "0"
        ):
            audio = _pcm16(audio)
        with self._lock:
            return self._prepare_fn(self.params, jnp.asarray(audio))

    def prepare_mel(self, melspec: np.ndarray):
        with self._lock:
            return self._prepare_mel_fn(self.params, jnp.asarray(melspec))

    def detect_language_from_cross(self, cross_kv) -> list[tuple[str, float]]:
        codes = self.tokenizer.spec.language_codes
        out = []
        for row in self.detect_language_probs_from_cross(cross_kv):
            i = int(np.argmax(row))
            out.append((codes[i], float(row[i])))
        return out

    def detect_language_probs_from_cross(self, cross_kv) -> np.ndarray:
        """Full per-language probability rows, aligned with
        tokenizer.spec.language_codes (one row per batch item)."""
        with self._lock:
            return np.asarray(self._detect_fn(self.params, cross_kv))

    def decode_batch(
        self,
        cross_kv,
        prompts: list[list[int]],
        sot_indices: Sequence[int],
        options: TranscribeOptions,
        temperatures: Sequence[float] | None = None,
        seed: int = 0,
    ) -> list[DecodeResult]:
        """One decode pass over a prepared batch. cross_kv batch dim must
        equal len(prompts) (already padded to a bucket)."""
        kv_arr = cross_kv.get("kv", cross_kv.get("kv8", cross_kv.get("kv4")))
        b = kv_arr.shape[2]  # batch axis is 2 in every layout
        assert len(prompts) <= b
        n_real = len(prompts)
        prompts = list(prompts) + [[self.spec.eot + 1]] * (b - n_real)
        sot_idx = np.asarray(
            list(sot_indices) + [0] * (b - n_real), np.int32
        )
        if temperatures is None:
            temperatures = [options.temperatures[0]] * n_real

        # best_of sampling (T>0 only): tile each item K times so the
        # sampling loop draws K independent hypotheses per item in one
        # program, then keep the best by avg logprob — faster-whisper's
        # best_of via CTranslate2 num_hypotheses. Only when the tiled
        # batch still fits a batch bucket (fallback sub-batches are
        # small); the continuous path's lanes implement the same policy.
        k_bo = 1
        if (
            options.best_of > 1
            and n_real > 0
            and all(t > 0 for t in temperatures[:n_real])
            and n_real * options.best_of <= self.batch_buckets[-1]
        ):
            k_bo = options.best_of
            idx = jnp.asarray(np.repeat(np.arange(n_real), k_bo), np.int32)
            bucket = _bucket(n_real * k_bo, self.batch_buckets)
            gather = jnp.concatenate(
                [idx, jnp.zeros((bucket - n_real * k_bo,), jnp.int32)]
            )
            cross_kv = jax.tree.map(
                lambda a: jnp.take(a, gather, axis=2), cross_kv
            )
            kv_arr = cross_kv.get("kv", cross_kv.get("kv8", cross_kv.get("kv4")))
            b = kv_arr.shape[2]
            prompts = [
                prompts[i] for i in range(n_real) for _ in range(k_bo)
            ] + [[self.spec.eot + 1]] * (b - n_real * k_bo)
            sot_idx = np.asarray(
                [sot_indices[i] for i in range(n_real) for _ in range(k_bo)]
                + [0] * (b - n_real * k_bo),
                np.int32,
            )
            temperatures = [
                temperatures[i] for i in range(n_real) for _ in range(k_bo)
            ]
            n_tiled = n_real * k_bo
        else:
            n_tiled = n_real
        temps = np.asarray(
            list(temperatures) + [0.0] * (b - n_tiled), np.float32
        )
        prompt_arr, prompt_len = self._pad_prompts(prompts)
        prompt_pad = prompt_arr.shape[1]
        requested = (
            options.max_new_tokens
            if options.max_new_tokens is not None
            else self.cfg.n_text_ctx
        )
        max_new = np.int32(requested)
        # Static cache length bucket: the self-KV cache is fully re-read
        # every step, so size it to the generation budget, not the 448 max.
        cache_len = prompt_pad + _bucket(
            min(requested, self.cfg.n_text_ctx), self.gen_buckets
        )
        cache_len = min(cache_len, self.cfg.n_text_ctx)
        common_args = (
            self.params,
            cross_kv,
            jnp.asarray(prompt_arr),
            jnp.asarray(prompt_len),
            jnp.asarray(sot_idx),
            self.suppress_mask_for(options),
            jnp.asarray(~np.full((b,), options.without_timestamps)),
        )
        # suppress_blank / max_initial_timestamp are STATIC program args
        # (like no_repeat_ngram): the defaults compile to the exact program
        # warmup built; a niche value pays one extra compile.
        sb_static, mit_static = _rule_statics(options)
        # Beam search runs at T=0 only; fallback re-decodes at T>0 switch to
        # sampling (same policy as whisper's beam->sampling escalation).
        use_beam = options.beam_size > 1 and all(t == 0.0 for t in temps)
        # patience widens the lockstep lane pool to ceil(k*patience) — the
        # frozen-lane analogue of CTranslate2's "collect k*patience finished
        # hypotheses" rule; patience=1.0 is the exact unwidened program.
        beam_lanes = max(
            options.beam_size,
            int(math.ceil(options.beam_size * max(options.patience, 1.0))),
        )
        rep_arr = jnp.full((b,), options.repetition_penalty, np.float32)
        if use_beam and self.beam_chunk > 0:
            tokens, gen_len, sum_lp, ns_prob = self._decode_beam_chunked(
                common_args, rep_arr, max_new, beam_lanes,
                options.length_penalty, cache_len,
                options.no_repeat_ngram_size, sb_static, mit_static,
            )
        else:
            with self._lock:
                if use_beam:
                    tokens, gen_len, sum_lp, ns_prob = self._decode_beam_fn(
                        *common_args,
                        rep_arr,
                        max_new,
                        beam_lanes,
                        jnp.float32(options.length_penalty),
                        cache_len,
                        options.no_repeat_ngram_size,
                        sb_static,
                        mit_static,
                    )
                else:
                    tokens, gen_len, sum_lp, ns_prob = self._decode_fn(
                        *common_args,
                        jnp.asarray(temps),
                        rep_arr,
                        max_new,
                        jax.random.PRNGKey(seed),
                        cache_len,
                        options.no_repeat_ngram_size,
                        sb_static,
                        mit_static,
                    )
        results = self._extract_results(
            tokens, gen_len, sum_lp, ns_prob, temps, n_tiled
        )
        if k_bo == 1:
            return results
        # best_of reduction: keep each item's best hypothesis by average
        # log-probability (CTranslate2 returns sampled hypotheses sorted
        # by score and faster-whisper keeps [0])
        return [
            max(results[i * k_bo : (i + 1) * k_bo],
                key=lambda r: r.avg_logprob)
            for i in range(n_real)
        ]

    def enable_beam_chunk(self, steps: int = 24) -> None:
        """Opt into preemptible beamed decodes (hybrid beam serving, where
        beamed fulls share the chip with latency-sensitive continuous
        ticks). No-op when WL_BEAM_CHUNK pinned a value (including 0) or a
        caller already set one. Call BEFORE warmup so the segment programs
        compile then, not on the first live beamed window."""
        if not self._beam_chunk_forced and not self.beam_chunk:
            self.beam_chunk = steps

    def _decode_beam_chunked(
        self, common_args, rep_arr, max_new, beam_lanes,
        length_penalty, cache_len, no_repeat_ngram, sb_static, mit_static,
    ):
        """Preemptible beam decode (beam_chunk > 0): the monolithic beam
        program holds the device for the whole multi-second decode,
        starving latency-sensitive dispatches that share the chip (the
        continuous scheduler's ticks in hybrid beam serving — measured
        multi-second partial-latency p95 tails, BENCH_NOTES round 5). Run
        the SAME loop in bounded segments of `beam_chunk` steps instead:
        after each segment the host syncs on one `done` boolean, and that
        gap is where other threads' queued programs run. The engine lock is
        released between segments. Token-exact vs the monolithic program by
        construction (same body; test_decoding::test_beam_chunked_matches_
        monolithic). The BK carry rides between segments as jit ARGUMENTS
        (device-resident, never fetched; big trees as jit arguments is
        also the relay rule, CLAUDE.md)."""
        params, cross_kv, prompts, prompt_len, sot_idx, mask, ts_en = common_args
        with self._lock:
            carry, ns_prob = self._beam_start_fn(
                params, cross_kv, prompts, prompt_len, sot_idx,
                beam_lanes, cache_len,
            )
        cap = int(self.beam_chunk)
        while True:
            with self._lock:
                carry, done = self._beam_seg_fn(
                    params, cross_kv, prompts, prompt_len, mask, ts_en,
                    rep_arr, max_new, carry, np.int32(cap),
                    beam_lanes, no_repeat_ngram, sb_static, mit_static,
                )
            if bool(np.asarray(done)):  # the preemption sync point
                break
            cap += int(self.beam_chunk)
        with self._lock:
            tokens, gen_len, sum_lp = self._beam_finish_fn(
                carry, jnp.float32(length_penalty), beam_lanes
            )
        return tokens, gen_len, sum_lp, ns_prob

    def _extract_results(
        self, tokens, gen_len, sum_lp, ns_prob, temps, n_real
    ) -> list[DecodeResult]:
        tokens = np.asarray(tokens)
        gen_len = np.asarray(gen_len)
        sum_lp = np.asarray(sum_lp)
        ns_prob = np.asarray(ns_prob)

        results = []
        for i in range(n_real):
            sampled = tokens[i, : gen_len[i]]
            ended_with_eot = len(sampled) > 0 and sampled[-1] == self.spec.eot
            text_tokens = sampled[:-1] if ended_with_eot else sampled
            # whisper convention: avg over len(tokens)+1 (the +1 is EOT)
            denom = len(text_tokens) + 1
            text = self.tokenizer.decode([int(t) for t in text_tokens])
            results.append(
                DecodeResult(
                    tokens=text_tokens.astype(np.int32),
                    avg_logprob=float(sum_lp[i]) / max(denom, 1),
                    no_speech_prob=float(ns_prob[i]),
                    compression_ratio=compression_ratio(text),
                    temperature=float(temps[i]),
                )
            )
        return results

    def transcribe_batch_async(
        self,
        audio: np.ndarray,  # [B_bucket, N_SAMPLES] float32
        prompts: list[list[int]],
        sot_indices: Sequence[int],
        lang_known: Sequence[bool],
        options: TranscribeOptions,
        seed: int = 0,
    ) -> "_PendingBatch":
        """Dispatch attempt-1 transcription of a window batch WITHOUT
        fetching results: both device programs (prepare + fused
        language-ID/decode) are enqueued and a _PendingBatch handle is
        returned; .resolve() forces the device->host fetch. JAX dispatch
        is asynchronous, so a caller can upload + enqueue window batch
        N+1 before resolving batch N — overlapping the host-side fixed
        cost (audio upload, program dispatch, result round-trip) with
        batch N's device compute. That fixed cost measured 643 ms per
        window-batch through the relay (bench.py r4), on par with the
        compute itself. bench.py pipelines at depth 2; the seek-loop
        paths cannot (each window's prompt conditions on the previous
        window's tokens)."""
        b = audio.shape[0]
        _, cross_kv = self.prepare(audio)
        n_real = len(prompts)
        prompts = list(prompts) + [[self.spec.eot + 1]] * (b - n_real)
        sot_idx = np.asarray(list(sot_indices) + [0] * (b - n_real), np.int32)
        known = np.asarray(list(lang_known) + [True] * (b - n_real))
        temps = np.full((b,), options.temperatures[0], np.float32)
        prompt_arr, prompt_len = self._pad_prompts(prompts)
        prompt_pad = prompt_arr.shape[1]
        requested = (
            options.max_new_tokens
            if options.max_new_tokens is not None
            else self.cfg.n_text_ctx
        )
        cache_len = min(
            prompt_pad + _bucket(min(requested, self.cfg.n_text_ctx), self.gen_buckets),
            self.cfg.n_text_ctx,
        )
        with self._lock:
            tokens, gen_len, sum_lp, ns_prob, lang_probs = self._detect_decode_fn(
                self.params,
                cross_kv,
                jnp.asarray(prompt_arr),
                jnp.asarray(prompt_len),
                jnp.asarray(sot_idx),
                jnp.asarray(known),
                self.suppress_mask_for(options),
                jnp.asarray(~np.full((b,), options.without_timestamps)),
                jnp.asarray(temps),
                jnp.full((b,), options.repetition_penalty, np.float32),
                np.int32(requested),
                jax.random.PRNGKey(seed),
                cache_len,
                options.no_repeat_ngram_size,
                *_rule_statics(options),
            )
        return _PendingBatch(
            self, tokens, gen_len, sum_lp, ns_prob, lang_probs, temps,
            n_real, cross_kv,
        )

    def transcribe_batch(
        self,
        audio: np.ndarray,  # [B_bucket, N_SAMPLES] float32
        prompts: list[list[int]],
        sot_indices: Sequence[int],
        lang_known: Sequence[bool],
        options: TranscribeOptions,
        seed: int = 0,
    ) -> tuple[list[DecodeResult], list[tuple[str, float]], Any]:
        """Attempt-1 transcription of a window batch.

        Items with lang_known[i] == False get their prompt's language token
        spliced in from on-device detection. Two dispatches: prepare, then a
        fused language-ID+decode program. Returns (results,
        [(language, prob)] per item). Gate failures should be retried via
        decode_with_fallback at the next temperatures."""
        return self.transcribe_batch_async(
            audio, prompts, sot_indices, lang_known, options, seed=seed
        ).resolve()

    def align_words(
        self,
        cross_kv,
        item_index: int,
        text_tokens: Sequence[int],
        num_frames: int,
        merge: bool = True,
        cross_len: int | None = None,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        language: str | None = None,
        task: str = "transcribe",
    ):
        """Word timings for one decoded window item (cross-attention DTW).

        Runs one teacher-forced B=1 pass over [sot-seq + text + eot] against
        the item's slice of the already-computed cross-KV, then host-side
        DTW (engine/align.py). Returns a list of WordTiming. merge=False
        returns raw timings so the caller can apply the reference's duration
        hacks between alignment and punctuation merging
        (add_word_timestamps, transcriber_faster_whisper.py:1541-1566).

        `language`/`task` condition the teacher-forcing sot sequence (the
        reference aligns with the language-configured tokenizer); the
        sequence length is the same for every language, so no new
        program shapes. None keeps the engine tokenizer's default.
        """
        prep = self.align_prepare(text_tokens, language=language, task=task)
        if prep is None:
            return []
        arr, sot_len, text_tokens = prep
        sub_cross = jax.tree.map(
            lambda a: jnp.take(a, jnp.asarray([item_index]), axis=2), cross_kv
        )
        if cross_len is None:
            # full context of whatever cross array was handed in
            kv_arr = cross_kv.get("kv")
            cross_len = (
                kv_arr.shape[3] if kv_arr is not None
                else cross_kv.get("kv8", cross_kv.get("kv4")).shape[4]
            )
        with self._lock:
            logits, cross = self._align_fn(
                self.params, sub_cross, jnp.asarray(arr),
                jnp.asarray([cross_len], np.int32),
            )
        return self.align_finish(
            np.asarray(logits, np.float32), np.asarray(cross, np.float32),
            text_tokens, sot_len, num_frames, merge=merge,
            prepend_punctuations=prepend_punctuations,
            append_punctuations=append_punctuations,
        )

    def align_prepare(
        self,
        text_tokens: Sequence[int],
        language: str | None = None,
        task: str = "transcribe",
    ):
        """Host-side half 1 of word alignment: the bucketed teacher-forcing
        token array for [sot-seq + text + eot]. Returns (arr[1, pmax],
        sot_len, text_tokens) or None when no text tokens remain. Split
        out so callers that must serialize the DEVICE dispatch elsewhere
        (the multi-host op log, parallel/serve_multihost.py) can run
        prepare → align program → align_finish as separate stages."""
        tok = self.tokenizer
        text_tokens = [int(t) for t in text_tokens if t < tok.eot]
        if not text_tokens:
            return None
        seq_tok = tok
        if language is not None:
            seq_tok = WhisperTokenizer(
                tok.spec, tok.backend, language=language, task=task
            )
        seq = seq_tok.sot_sequence() + text_tokens + [tok.eot]
        sot_len = len(seq) - len(text_tokens) - 1
        pmax = _bucket(len(seq), self.prompt_buckets)
        arr = np.zeros((1, pmax), np.int32)
        arr[0, : len(seq)] = seq[:pmax]
        return arr, sot_len, text_tokens

    def align_finish(
        self,
        logits: np.ndarray,  # [1, T, V] (or [T, V]) from the align program
        cross: np.ndarray,  # [L, 1, H, T, ctx] (or [L, H, T, ctx])
        text_tokens: list[int],
        sot_len: int,
        num_frames: int,
        merge: bool = True,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    ):
        """Host-side half 2 of word alignment: token probabilities + DTW +
        punctuation merge. Pure numpy — no device ops, so it can run on
        any thread without touching the engine's dispatch order."""
        from whisperlive_tpu.engine import align as align_mod

        tok = self.tokenizer
        if logits.ndim == 3:
            logits = logits[0]  # [T, V]
        if cross.ndim == 5:
            cross = cross[:, 0]  # [L, H, T, ctx]
        seq_len = sot_len + len(text_tokens) + 1
        # token probability: softmax over the TEXT vocab only (openai
        # find_alignment renormalizes logits[:, :eot]) — the full-vocab
        # sum would let timestamp mass deflate boundary-word probabilities
        # and falsely trip the hallucination suspicion rules downstream
        probs = []
        for i, t in enumerate(text_tokens):
            row = logits[sot_len - 1 + i][: tok.eot]
            row = row - row.max()
            p = np.exp(row)
            probs.append(float(p[t] / p.sum()))
        timings = align_mod.find_alignment_from_attn(
            cross[:, :, :seq_len, :],
            np.asarray(probs, np.float64),
            tok,
            text_tokens,
            sot_len,
            num_frames,
        )
        if not merge:
            return timings
        return align_mod.merge_punctuations(
            timings, prepend_punctuations, append_punctuations
        )

    def decode_with_fallback(
        self,
        cross_kv,
        prompts: list[list[int]],
        sot_indices: Sequence[int],
        options: TranscribeOptions,
        seed: int = 0,
    ) -> list[DecodeResult]:
        """Temperature-fallback decode (generate_with_fallback semantics,
        transcriber_faster_whisper.py:1350-1478): items whose output fails
        the compression-ratio or avg-logprob gate are re-decoded — only that
        sub-batch — at the next temperature."""
        n = len(prompts)
        results: list[DecodeResult | None] = [None] * n
        history: list[list[DecodeResult]] = [[] for _ in range(n)]
        pending = list(range(n))
        sub_cross = cross_kv
        sub_prompts, sub_sot = list(prompts), list(sot_indices)

        for t_i, temp in enumerate(options.temperatures):
            decoded = self.decode_batch(
                sub_cross,
                sub_prompts,
                sub_sot,
                options,
                temperatures=[temp] * len(sub_prompts),
                seed=seed + t_i,
            )
            still_failed = []
            for j, item in enumerate(pending):
                r = decoded[j]
                results[item] = r
                history[item].append(r)
                if fails_quality_gates(options, r):
                    still_failed.append(item)
            pending = still_failed
            if not pending or t_i == len(options.temperatures) - 1:
                break
            # Gather the failing sub-batch's cross-KV on device (padded to a
            # batch bucket by repeating the last index — padding slots decode
            # garbage that is simply dropped).
            bucket = _bucket(len(pending), self.batch_buckets)
            gather_idx = (pending + [pending[-1]] * bucket)[:bucket]
            idx = jnp.asarray(gather_idx, np.int32)
            sub_cross = jax.tree.map(lambda a: jnp.take(a, idx, axis=2), cross_kv)
            sub_prompts = [prompts[item] for item in pending]
            sub_sot = [sot_indices[item] for item in pending]

        for item in pending:
            results[item] = best_failed_attempt(options, history[item])
        return [r for r in results if r is not None]


class _PendingBatch:
    """An in-flight window batch: both device programs are enqueued, the
    outputs are still device arrays. resolve() forces the device->host
    fetch and builds DecodeResults — callers pipeline by dispatching the
    next batch before resolving this one (transcribe_batch_async)."""

    def __init__(
        self, engine, tokens, gen_len, sum_lp, ns_prob, lang_probs,
        temps, n_real, cross_kv,
    ):
        self._engine = engine
        self._outs = (tokens, gen_len, sum_lp, ns_prob)
        self._lang_probs = lang_probs
        self._temps = temps
        self._n_real = n_real
        self.cross_kv = cross_kv

    def resolve(self):
        """-> (results, [(language, prob)] per item, cross_kv)."""
        eng = self._engine
        tokens, gen_len, sum_lp, ns_prob = self._outs
        results = eng._extract_results(
            tokens, gen_len, sum_lp, ns_prob, self._temps, self._n_real
        )
        langs: list[tuple[str, float]] = []
        if eng.tokenizer.spec.multilingual:
            lang_probs = np.asarray(self._lang_probs)
            codes = eng.tokenizer.spec.language_codes
            for i in range(self._n_real):
                j = int(np.argmax(lang_probs[i]))
                langs.append((codes[j], float(lang_probs[i][j])))
        else:
            langs = [("en", 1.0)] * self._n_real
        return results, langs, self.cross_kv
