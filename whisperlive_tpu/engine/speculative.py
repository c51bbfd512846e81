"""Speculative greedy decoding: a distil-family draft proposes k tokens,
the target verifies all of them in one windowed MXU pass.

Why this is the right TPU lever: the decode loop is HBM-bound — every
sampled token re-reads the full cross-KV and all decoder weights
(BENCH_NOTES "element-rate-bound"). The verify pass (models/whisper.py
`decode_window`) scores k+1 positions per read of that resident state, so
with an agreeing draft the per-emitted-token HBM cost drops toward
1/(k+1) of the plain loop, while the MXU (idle at decode batch sizes)
absorbs the extra FLOPs for free.

Design (all shapes static, the whole loop is one jitted program):
  - The draft decodes k greedy steps via `lax.scan` of the ordinary
    `decode_step` (it is a real Whisper decoder — distil models share the
    teacher's encoder, so the draft cross-KV is projected from the SAME
    encoder output: `cross_from_enc`).
  - The target runs ONE `decode_window` pass over [cur, d1..dk] and a
    cheap `lax.scan` replays the sampler rules (ops/decoding.py
    `apply_logit_rules` / `advance_state`) along the draft path, yielding
    the target-greedy token after every position.
  - Acceptance = longest prefix where draft and target agree; the round
    emits `a` accepted drafts plus the target's bonus token. Rejected
    cache slots need NO rollback: slot validity is purely mask-based
    (j < slot_start), so stale K/V beyond the accepted point is simply
    overwritten by the next round's window.

Greedy output is TOKEN-EXACT vs the plain sampling loop
(engine.py `_decode` at temperature 0) by construction — the emitted
sequence depends only on target logits and the shared rule replay, never
on draft quality (tests/test_speculative.py pins this with a random,
never-agreeing draft). The draft only changes how many tokens each
round commits.

No reference counterpart: faster-whisper/CTranslate2 (the reference's
decode stack, transcriber_faster_whisper.py) has no speculative decoding;
this is a TPU-serving extension. The behavior contract is exactness vs
this engine's own greedy decode, which is parity-tested against HF.
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisperlive_tpu.engine.engine import (
    DecodeResult,
    TranscribeOptions,
    WhisperEngine,
    _bucket,
    _rule_statics,
    best_failed_attempt,
    fails_quality_gates,
)
from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.ops import decoding as dec
from whisperlive_tpu.utils import metrics as wl_metrics

logger = logging.getLogger(__name__)


class SpeculativeDecoder:
    """Owns the (target, draft) engine pair and the compiled spec-decode
    program. Host-side API mirrors the engine's decode surface at B=1.

    Requirements checked at construction:
      - identical vocab / control-token layout (the models must agree on
        token ids for acceptance to mean anything), and
      - identical encoder geometry (n_mels / n_audio_ctx / n_audio_state)
        so the draft cross-KV can be projected from the target's encoder
        output — the distil-whisper pairing (distil models freeze the
        teacher encoder), e.g. large-v3 + distil-large-v3.
    """

    def __init__(self, target: WhisperEngine, draft: WhisperEngine, k: int = 4):
        if target.cfg.n_vocab != draft.cfg.n_vocab:
            raise ValueError(
                "speculative draft must share the target vocabulary "
                f"(target {target.cfg.n_vocab} vs draft {draft.cfg.n_vocab})"
            )
        for f in ("n_mels", "n_audio_ctx", "n_audio_state"):
            if getattr(target.cfg, f) != getattr(draft.cfg, f):
                raise ValueError(
                    "speculative draft must share the target encoder "
                    f"geometry ({f}: {getattr(target.cfg, f)} vs "
                    f"{getattr(draft.cfg, f)}) — use a distil-family draft"
                )
        if not 1 <= k <= 16:
            raise ValueError(f"speculation depth k must be in [1, 16], got {k}")
        if k + 1 > 8:
            # the Tq<=8 int8 window kernel (ops/attention.py) is the verify
            # pass's HBM saving; beyond it the bf16 dequant fallback runs
            logger.warning(
                "k=%d gives %d-token verify windows — beyond the Tq<=8 "
                "int8 window kernel; the verify pass falls back to the "
                "bf16 dequant path and the projected speedup shrinks", k, k + 1
            )
        self.target = target
        self.draft = draft
        self.k = int(k)
        # cumulative acceptance diagnostics (host-side, across calls)
        self.stats = {"iterations": 0, "accepted": 0, "emitted": 0, "windows": 0}
        self._warming = False  # warmup decodes must not pollute stats/metrics

        cfg_d = draft.cfg
        bits = draft.cross_kv_bits

        def _cross_from_enc(params_d, enc):
            cross = wmod.compute_cross_kv(params_d, cfg_d, enc)
            if bits == 8:
                return wmod.quantize_cross_kv(cross)
            if bits == 4:
                return wmod.quantize_cross_kv_int4(cross)
            return cross

        self._cross_from_enc_fn = jax.jit(_cross_from_enc)
        # static: cache_len, no_repeat_ngram, suppress_blank, max_init_idx
        self._fn = jax.jit(self._build(), static_argnums=(11, 12, 13, 14))

    # ------------------------------------------------------------------

    def _build(self):
        cfg_t, cfg_d = self.target.cfg, self.draft.cfg
        spec = self.target.spec
        k = self.k

        def spec_decode(
            params_t,
            params_d,
            cross_t,
            cross_d,
            prompts,  # [1, P] int32, right-padded
            prompt_len,  # [1]
            sot_idx,  # [1]
            suppress_mask,  # [V] bool
            ts_enabled,  # [1] bool
            rep_penalty,  # [1] f32
            max_new,  # [] int32
            cache_len: int = 0,  # static
            no_repeat_ngram: int = 0,  # static
            suppress_blank: bool = True,  # static
            max_init_idx: int = -1,  # static; -1 = spec default
        ):
            b, prompt_pad = prompts.shape
            sb_vec = None if suppress_blank else jnp.zeros((1,), bool)
            mit_vec = (
                None if max_init_idx < 0
                else jnp.full((1,), max_init_idx, jnp.int32)
            )
            max_gen = cache_len - prompt_pad
            # k+1 slots of write headroom: the final verify window must
            # never clamp its dynamic_update_slice back into valid slots.
            kv_t = wmod.init_self_kv(cfg_t, b, cache_len + k + 1)
            kv_d = wmod.init_self_kv(cfg_d, b, cache_len + k + 1)
            state = dec.init_sampler_state(spec, prompt_len, max_gen)
            logits0, sot_logits, kv_t = wmod.decode_prefill(
                params_t, cfg_t, prompts, prompt_len, kv_t, cross_t,
                sot_idx=sot_idx,
            )
            _, kv_d = wmod.decode_prefill(
                params_d, cfg_d, prompts, prompt_len, kv_d, cross_d
            )
            no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, spec.no_speech]
            max_steps = jnp.minimum(max_new, max_gen)
            phist = (
                dec.right_align_prompt(prompts, prompt_len)
                if no_repeat_ngram > 0 else None
            )

            def emit(st, logits):
                """One greedy rule-replay step — the exact filter/advance
                sequence of engine._decode's loop body at temperature 0."""
                filtered = dec.apply_logit_rules(
                    spec, logits, st, suppress_mask, ts_enabled,
                    suppress_blank=sb_vec, max_initial_ts_idx=mit_vec,
                )
                filtered = dec.apply_repetition_penalty(
                    filtered, st, rep_penalty,
                    prompt_tokens=prompts, prompt_len=prompt_len,
                )
                filtered = dec.apply_no_repeat_ngram(
                    filtered, st, no_repeat_ngram, prompt_hist=phist
                )
                tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
                lp = jax.nn.log_softmax(filtered, axis=-1)[jnp.arange(b), tok]
                st = dec.advance_state(spec, st, tok, lp)
                return st._replace(finished=st.finished | (st.step >= max_steps)), tok

            # First token comes from the prompt logits (the plain loop's
            # first iteration); its K/V is written by the first window.
            state, cur = emit(state, logits0)

            def cond(carry):
                st = carry[0]
                return ~jnp.all(st.finished)

            def body(carry):
                st, cur, kv_t, kv_d, iters, accepted = carry
                slot0 = prompt_pad + st.step - 1  # cache slot of `cur`
                pos0 = st.prompt_len + st.step - 1  # [B] logical position

                # --- draft: k greedy proposals (cheap sequential model) --
                def dstep(c2, i):
                    dst, tok, kvd = c2
                    dlogits, kvd = wmod.decode_step(
                        params_d, cfg_d, tok, pos0 + i, slot0 + i,
                        prompt_len, prompt_pad, kvd, cross_d,
                    )
                    dst, nxt = emit(dst, dlogits)
                    return (dst, nxt, kvd), nxt

                # k+1 steps, not k: the extra step feeds d_k so ITS self-KV
                # is written at slot0+k — otherwise a fully-accepted round
                # leaves a permanent zero hole in the draft cache that every
                # later draft step attends (measured: self-draft acceptance
                # 0.67-0.90 with the hole vs ~0.98 without). Its proposal
                # d_{k+1} is discarded.
                (_, _, kv_d), drafts = jax.lax.scan(
                    dstep, (st, cur, kv_d), jnp.arange(k + 1)
                )
                drafts = drafts[:k]  # [k, B]

                # --- target: verify [cur, d1..dk] in ONE pass ------------
                win = jnp.concatenate([cur[:, None], drafts.T], axis=1)  # [B, k+1]
                wpos = pos0[:, None] + jnp.arange(k + 1)[None, :]
                logits_w, kv_t = wmod.decode_window(
                    params_t, cfg_t, win, wpos, slot0,
                    prompt_len, prompt_pad, kv_t, cross_t,
                )  # [B, k+1, V]

                # --- replay sampler rules along the draft path -----------
                def vstep(vst, i):
                    vst, g = emit(vst, logits_w[:, i])
                    return vst, (g, vst)

                _, (gs, vstates) = jax.lax.scan(vstep, st, jnp.arange(k + 1))
                # gs[i]: target-greedy token after window position i.
                # Draft d_{i+1} is accepted iff the target agrees AND the
                # hypothesis wasn't already finished (EOT / budget) there.
                acc = (gs[:-1] == drafts) & ~vstates.finished[:-1]  # [k, B]
                a = jnp.cumprod(acc.astype(jnp.int32), axis=0).sum(axis=0)[0]
                # commit: a accepted drafts + the bonus token gs[a]
                st = jax.tree.map(lambda y: y[a], vstates)
                cur = gs[a]
                return st, cur, kv_t, kv_d, iters + 1, accepted + a

            state, _, _, _, iters, accepted = jax.lax.while_loop(
                cond,
                body,
                (
                    state, cur, kv_t, kv_d,
                    jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                ),
            )
            return (
                state.sampled,
                state.gen_len,
                state.sum_logprob,
                no_speech_prob,
                iters,
                accepted,
            )

        return spec_decode

    # ------------------------------------------------------------------
    # host-side API (B=1)
    # ------------------------------------------------------------------

    def cross_from_enc(self, enc):
        """Project the draft's cross-KV from the target's encoder output
        (distil drafts share the teacher encoder — one encode per window)."""
        with self.target._lock:
            return self._cross_from_enc_fn(self.draft.params, enc)

    def decode(
        self,
        cross_t,
        cross_d,
        prompt: list[int],
        sot_index: int,
        options: TranscribeOptions,
    ) -> DecodeResult:
        """One speculative greedy decode. cross_* batch dims must be 1."""
        target = self.target
        kv = cross_t.get("kv", cross_t.get("kv8", cross_t.get("kv4")))
        if kv.shape[2] != 1:
            raise ValueError(
                "speculative decode is single-request (per-round acceptance "
                f"is scalar); got cross-KV batch {kv.shape[2]} — use "
                "engine.decode_batch for batched windows"
            )
        prompt_arr, prompt_len = target._pad_prompts([prompt])
        prompt_pad = prompt_arr.shape[1]
        requested = (
            options.max_new_tokens
            if options.max_new_tokens is not None
            else target.cfg.n_text_ctx
        )
        cache_len = prompt_pad + _bucket(
            min(requested, target.cfg.n_text_ctx), target.gen_buckets
        )
        cache_len = min(cache_len, target.cfg.n_text_ctx)
        with target._lock:
            tokens, gen_len, sum_lp, ns_prob, iters, accepted = self._fn(
                target.params,
                self.draft.params,
                cross_t,
                cross_d,
                jnp.asarray(prompt_arr),
                jnp.asarray(prompt_len),
                jnp.asarray(np.asarray([sot_index], np.int32)),
                target.suppress_mask_for(options),
                jnp.asarray(~np.full((1,), options.without_timestamps)),
                jnp.full((1,), options.repetition_penalty, np.float32),
                np.int32(requested),
                cache_len,
                options.no_repeat_ngram_size,
                *_rule_statics(options),
            )
        (result,) = target._extract_results(
            tokens, gen_len, sum_lp, ns_prob, np.zeros((1,), np.float32), 1
        )
        if not self._warming:
            self.stats["iterations"] += int(iters)
            self.stats["accepted"] += int(accepted)
            self.stats["emitted"] += int(gen_len[0])
            self.stats["windows"] += 1
            wl_metrics.track_speculative_window(self.acceptance_rate())
        return result

    def acceptance_rate(self) -> float:
        """Fraction of draft proposals the target accepted (cumulative)."""
        proposed = self.stats["iterations"] * self.k
        return self.stats["accepted"] / proposed if proposed else 0.0

    def decode_with_fallback(
        self,
        cross_t,
        cross_d,
        prompt: list[int],
        sot_index: int,
        options: TranscribeOptions,
        seed: int = 0,
    ) -> list[DecodeResult]:
        """Temperature-fallback loop (same policy as
        engine.decode_with_fallback / transcriber_faster_whisper.py
        1350-1478) with the T=0 attempt routed through the speculative
        program; T>0 retries use the target's plain sampling decode."""
        history: list[DecodeResult] = []
        for t_i, temp in enumerate(options.temperatures):
            if temp == 0.0 and options.beam_size == 1:
                r = self.decode(cross_t, cross_d, prompt, sot_index, options)
            else:
                (r,) = self.target.decode_batch(
                    cross_t, [prompt], [sot_index], options,
                    temperatures=[temp], seed=seed + t_i,
                )
            history.append(r)
            if not fails_quality_gates(options, r):
                return [r]
        return [best_failed_attempt(options, history)]

    def warmup(self, options: TranscribeOptions | None = None,
               prompt_buckets: Sequence[int] | None = None) -> None:
        """Compile the speculative program at the serving prompt buckets
        (cold XLA compiles take minutes on the real chip)."""
        if options is None:
            options = TranscribeOptions(language="en")
        target = self.target
        audio = np.zeros((1, 480000), np.float32)
        enc, cross_t = target.prepare(audio)
        cross_d = self.cross_from_enc(enc)
        prompt, sot = target.build_prompt(options, language="en")
        buckets = prompt_buckets or target.prompt_buckets
        self._warming = True
        try:
            for pmax in buckets:
                logger.info("spec warmup: prompt bucket %d", pmax)
                pad = [self.target.tokenizer.eot] * max(pmax - len(prompt), 0)
                self.decode(cross_t, cross_d, (pad + prompt)[-pmax:], 0, options)
        finally:
            self._warming = False
