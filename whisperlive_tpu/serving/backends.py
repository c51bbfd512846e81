"""Transcription backends for the serving layer.

The reference dispatches to three per-client backend classes
(faster_whisper/tensorrt/openvino, whisper_live/backend/*); here a backend
is anything with

    async def transcribe(chunk, options, *, language, previous_tokens, uid)
        -> BatchResult | None

Two implementations:
  * TpuBackend — the real path: VAD gate, then a BatchRequest into the
    shared BatchScheduler (all sessions share one TPU program).
  * FakeBackend — deterministic, model-free; the test seam the reference
    establishes by stubbing `transcribe_audio` (SURVEY §4).
"""

from __future__ import annotations

import asyncio
import dataclasses
import os
import logging
import time
from types import SimpleNamespace
from typing import Optional, Sequence

import numpy as np

from whisperlive_tpu.engine.engine import TranscribeOptions
from whisperlive_tpu.engine.scheduler import BatchRequest, BatchResult, BatchScheduler
from whisperlive_tpu.serving.session import SessionOptions

logger = logging.getLogger(__name__)



# Generation budget per 30 s window (<=224 keeps the decode program on the
# 256-slot KV-cache bucket). Overridable for load tests with random weights,
# where decoding never hits EOT early (real speech is ~3-4 tokens/s).
STREAMING_MAX_NEW_TOKENS = int(os.environ.get("WL_STREAM_MAX_TOKENS", "224"))


# Load-testing with random weights: quality gates always fail (avg_logprob
# of noise < -1) and every window cascades through all 6 fallback
# temperatures, inflating device work ~6x vs trained weights. This switch
# emulates the trained-weights behavior (first attempt passes).
_DISABLE_GATES = os.environ.get("WL_DISABLE_FALLBACK_GATES") == "1"


def transcribe_options_from_session(
    options: SessionOptions, language: Optional[str] = None,
    beam_size: int = 1,
) -> TranscribeOptions:
    """Map per-connection handshake options onto engine decode options.

    beam_size is a SERVER-side policy (the wire handshake has no such field;
    the reference hard-codes beam 5 inside its transcriber). Greedy is the
    latency-friendly default; --beam_size N enables the batched beam program
    (device batch shrinks to keep B x K bounded)."""
    kw = {}
    if _DISABLE_GATES:
        kw = dict(
            temperatures=(0.0,),
            log_prob_threshold=None,
            compression_ratio_threshold=None,
            no_speech_threshold=None,
        )
    return TranscribeOptions(
        language=language or options.language,
        task=options.task,
        initial_prompt=options.initial_prompt,
        hotwords=options.hotwords,
        word_timestamps=options.word_timestamps,
        max_new_tokens=STREAMING_MAX_NEW_TOKENS,
        beam_size=beam_size,
        **kw,
    )


class TpuBackend:
    """Routes chunks through the shared batch scheduler, with host-side
    VAD gating (the reference gates with silero before decode)."""

    def __init__(
        self,
        scheduler: BatchScheduler,
        use_vad_default: bool = True,
        vad_threshold: float = 0.5,
        model_name: str | None = None,
        beam_size: int = 1,
        continuous_scheduler=None,
        beam_mode: str = "full",
        continuous_only: bool = False,
        spec_scheduler=None,
    ):
        self.scheduler = scheduler
        # Multi-host serving (parallel/serve_multihost.py): ONLY the
        # continuous engine's ops are replayed on follower processes, so
        # every request must ride the continuous path. Requests the
        # window scheduler would normally absorb get their options
        # coerced to the continuous program's baked semantics (warned
        # once per uid) and over-cap windows are clamped.
        self.continuous_only = continuous_only
        self._coerce_warned: set[str] = set()
        # Decode-step-level continuous batching (engine/continuous.py):
        # requests join a running decode instead of waiting for the
        # previous window batch — including word-timestamps sessions
        # (alignment runs against the slot's device-resident cross-KV at
        # harvest) and beamed requests when the slot pool was built with
        # matching lockstep lanes. Only no_repeat_ngram and beam-width
        # mismatches fall back to the window scheduler (_pick_scheduler).
        self.continuous_scheduler = continuous_scheduler
        self.model_name = model_name
        self.beam_size = beam_size
        # Hybrid beam serving (beam_mode="refresh"): incremental partial
        # windows decode GREEDY on the continuous pool (built with
        # beam_width=1, full slot count), while full re-decodes — the
        # periodic WL_PREFIX_REFRESH windows and the post-commit
        # from-scratch windows — keep beam_size>1, which _pick_scheduler
        # routes to the window scheduler's batched beam program. The
        # beamed hypothesis re-seeds the prefix cache, so greedy partials
        # always EXTEND a beam-derived hypothesis; committed text must
        # survive the next beamed full re-decode to persist. This keeps
        # beam-5 quality on everything durable at greedy-partial latency
        # (the reference decodes beam-5 always; a fully-beamed continuous
        # pool divides the slot budget by the lane count and saturates,
        # BENCH_NOTES round 3).
        self.hybrid_beam = (
            beam_mode == "refresh"
            and beam_size > 1
            and continuous_scheduler is not None
            and getattr(continuous_scheduler, "beam_width", 1) == 1
        )
        # observability: how the hybrid split actually routed
        self.hybrid_stats = {"greedy_partials": 0, "beamed_fulls": 0}
        # Hybrid mode shares the chip between multi-second beamed fulls
        # and latency-sensitive continuous ticks — run the beamed decode
        # in preemptible segments (engine._decode_beam_chunked) so ticks
        # interleave between segments instead of queueing behind one
        # monolithic program. WL_BEAM_CHUNK (incl. =0) overrides.
        eng = getattr(scheduler, "engine", None)
        if self.hybrid_beam and hasattr(eng, "enable_beam_chunk"):
            eng.enable_beam_chunk()
        # Mixed speculative routing (VERDICT r4 item 3): a SECOND
        # continuous pool with a draft attached serves the FULL re-decodes
        # (periodic WL_PREFIX_REFRESH windows + post-commit from-scratch
        # windows, ~100 steps each) as speculative verify rounds — the
        # regime where a verify round pays for itself (+15-40% update
        # throughput, far better p95, BENCH_NOTES round 4) — while short
        # incremental tails (~10 sampled tokens) stay plain on the main
        # pool, where a verify round cannot amortize at any realistic
        # acceptance. Both pools share the target engine (device ops
        # serialize on its lock); greedy output is token-exact on either
        # path, so routing only changes latency. Mutually exclusive with
        # hybrid beam (full re-decodes cannot be both beamed and drafted).
        self.spec_scheduler = spec_scheduler
        if spec_scheduler is not None and self.hybrid_beam:
            raise ValueError(
                "mixed speculative routing and hybrid beam both re-route "
                "full re-decodes; use one or the other"
            )
        # Acceptance hysteresis: live acceptance below the measured
        # round-cost breakeven (~0.25: a verify round costs ~2 plain steps
        # of HBM and commits 1+a*k tokens, BENCH_NOTES round 4) means the
        # spec pool is SLOWER than plain — auto-disable, keep probing one
        # window every probe interval, re-enable above the upper band.
        self.spec_breakeven = float(os.environ.get("WL_SPEC_BREAKEVEN", "0.25"))
        self.spec_reenable = float(os.environ.get("WL_SPEC_REENABLE", "0.35"))
        self.spec_probe_s = float(os.environ.get("WL_SPEC_PROBE_S", "30"))
        # EMA warm-up: windows the EMA must see before the breaker may
        # act. Cold-start full decodes (a fresh stream's first fractional
        # seconds of audio) measure well below steady-state acceptance
        # (chip-measured 0.22 cold vs 0.6-0.73 steady, BENCH_NOTES), so a
        # small warm-up would trip the breaker on startup noise.
        self.spec_warm_windows = int(
            os.environ.get("WL_SPEC_WARM_WINDOWS", "16")
        )
        self._spec_enabled = True
        self._spec_last_probe = 0.0
        self.spec_route_stats = {
            "spec_fulls": 0, "plain_fulls": 0, "probes": 0,
            "disables": 0, "reenables": 0,
        }
        self.use_vad_default = use_vad_default
        self._vads: dict[str, object] = {}
        self._vad_threshold = vad_threshold
        # Incremental partial decoding (continuous path): per-stream cache
        # of the last window's decoded tokens, keyed by the tail anchor
        # (session timestamp_offset). While the anchor is unchanged the
        # next window re-transcribes the SAME audio plus a little more, so
        # the previous hypothesis is forced as a decode prefix — prefilled
        # in one MXU pass — and only the new tail tokens are sampled
        # (~10 steps instead of ~100). A commit moves the anchor and
        # invalidates the cache, forcing a from-scratch decode.
        self.incremental = os.environ.get("WL_INCREMENTAL", "1") != "0"
        self._prefix_cache: dict[str, tuple[float, tuple[int, ...]]] = {}
        # Lock-in bound: every Nth consecutive prefix window decodes from
        # scratch, so a plausible-but-wrong carried hypothesis (one the
        # quality gates keep passing) survives at most N updates even if
        # the stabilization layer never commits. 0 disables the refresh.
        # 16 (from 8) halves the full-re-decode load — the dominant slot-
        # occupancy term at high stream counts (a full decode is ~100
        # steps vs ~10 for a prefix window); the quality gates and session
        # commits still bound lock-in within a few seconds of audio.
        self.prefix_refresh = int(os.environ.get("WL_PREFIX_REFRESH", "16"))
        self._prefix_streak: dict[str, int] = {}
        # per-request engine deadline; benchmarks raise it to survive cold
        # compiles of rarely-hit shapes without dropping samples
        self.request_timeout_s = 60.0
        # Adaptive cadence at oversubscription: when the continuous pool is
        # saturated, each stream spaces its submissions by a fraction of
        # its own observed round-trip, so requests spend the wait in the
        # session (where new audio keeps accruing) instead of in the
        # scheduler queue. Round-trip p50 drops; throughput is unchanged
        # (the queue stays non-empty — alpha < 1 keeps slots fed) and
        # content freshness was already handled by late-bound audio.
        self.adaptive_cadence = os.environ.get("WL_ADAPTIVE_CADENCE", "1") != "0"
        self.cadence_alpha = float(os.environ.get("WL_CADENCE_ALPHA", "0.7"))
        self._rt_ema: dict[str, float] = {}

    def cadence_spacing_s(self, uid: str) -> float:
        """Seconds the session should wait between submissions for `uid`.

        0 unless adaptive cadence is on AND the continuous pool has been
        saturated for a while (load EMA > 1.2). The spacing is
        alpha x the stream's round-trip EMA: at steady state the stream
        still submits about as often as the pool can serve it, but with
        most of the former queue wait spent buffering audio instead."""
        if not self.adaptive_cadence or self.continuous_scheduler is None:
            return 0.0
        load = getattr(self.continuous_scheduler, "load_factor", lambda: 0.0)()
        if load <= 1.2:
            return 0.0
        return self.cadence_alpha * self._rt_ema.get(uid, 0.0)

    def _pick_scheduler(
        self,
        options: TranscribeOptions,
        duration_s: float | None = None,
        continuous=None,
    ):
        """Route a request to `continuous` (default: the main continuous
        pool; mixed spec routing passes the spec pool) unless its baked
        program cannot honor the options — then the window scheduler."""
        if continuous is None:
            continuous = self.continuous_scheduler
        if continuous is None:
            return self.scheduler
        if options.no_repeat_ngram_size > 0:
            return self.scheduler
        # the continuous step program bakes ONE suppress mask; a request
        # with a different suppress config must decode on the window path
        # (which batches by suppress signature) or its tokens would differ
        key = getattr(continuous, "suppress_key", None)
        if key is not None and key != (
            options.suppress_tokens, options.suppress_blank
        ):
            return self.scheduler
        # ditto max_initial_timestamp: the continuous step program bakes
        # the 1.0 s default
        if (
            options.max_initial_timestamp is not None
            and float(options.max_initial_timestamp) != 1.0
        ):
            return self.scheduler
        # beamed requests ride the continuous path when the slot pool was
        # built with matching lockstep lanes (--beam_size N); a mismatch
        # (rare: per-request override) falls back to the window scheduler,
        # which decodes any beam size
        if max(options.beam_size, 1) != getattr(continuous, "beam_width", 1):
            return self.scheduler
        # Windows longer than the continuous cross-KV content cap (catch-up
        # after stalls; offline tails) go to the window scheduler, which
        # keeps the full 30 s encoder context per request.
        max_s = getattr(continuous, "max_window_s", None)
        if duration_s is not None and max_s is not None and duration_s > max_s:
            return self.scheduler
        return continuous

    def _spec_route(self) -> bool:
        """Hysteresis decision for routing a full re-decode to the spec
        pool. While disabled, one probe window per spec_probe_s keeps the
        acceptance EMA live so recovery (e.g. a language change back into
        the draft's distribution) can re-enable the route."""
        sched = self.spec_scheduler
        if sched is None:
            return False
        acc = sched.acceptance_ema
        warm = sched._acc_ema_n >= self.spec_warm_windows
        if self._spec_enabled:
            if warm and acc < self.spec_breakeven:
                self._spec_enabled = False
                self._spec_last_probe = time.monotonic()
                self.spec_route_stats["disables"] += 1
                logger.warning(
                    "speculative routing disabled: live acceptance EMA "
                    "%.2f < breakeven %.2f (full re-decodes fall back to "
                    "the plain pool; probing every %.0fs)",
                    acc, self.spec_breakeven, self.spec_probe_s,
                )
                return False
            return True
        if warm and acc > self.spec_reenable:
            self._spec_enabled = True
            self.spec_route_stats["reenables"] += 1
            logger.info(
                "speculative routing re-enabled: acceptance EMA %.2f > "
                "%.2f", acc, self.spec_reenable,
            )
            return True
        now = time.monotonic()
        if now - self._spec_last_probe >= self.spec_probe_s:
            self._spec_last_probe = now
            self.spec_route_stats["probes"] += 1
            return True
        return False

    def _coerce_to_continuous(
        self, topts: TranscribeOptions, chunk: np.ndarray, uid: str
    ) -> tuple[TranscribeOptions, np.ndarray]:
        """Force a request onto the continuous path (continuous_only
        serving — multi-host mode has no replayable window scheduler).
        Options the continuous step program cannot honor are replaced by
        its baked values; windows over the content cap are clamped."""
        cs = self.continuous_scheduler
        changed = []
        if topts.no_repeat_ngram_size > 0:
            topts = dataclasses.replace(topts, no_repeat_ngram_size=0)
            changed.append("no_repeat_ngram_size")
        key = getattr(cs, "suppress_key", None)
        if key is not None and key != (
            topts.suppress_tokens, topts.suppress_blank
        ):
            topts = dataclasses.replace(
                topts, suppress_tokens=key[0], suppress_blank=key[1]
            )
            changed.append("suppress config")
        if (
            topts.max_initial_timestamp is not None
            and float(topts.max_initial_timestamp) != 1.0
        ):
            topts = dataclasses.replace(topts, max_initial_timestamp=1.0)
            changed.append("max_initial_timestamp")
        pool_beam = getattr(cs, "beam_width", 1)
        if max(topts.beam_size, 1) != pool_beam:
            topts = dataclasses.replace(topts, beam_size=pool_beam)
            changed.append("beam_size")
        max_s = getattr(cs, "max_window_s", None)
        if max_s is not None and len(chunk) / 16000.0 > max_s:
            chunk = chunk[: int(max_s * 16000)]
            changed.append("window length (clamped)")
        if changed and uid not in self._coerce_warned:
            self._coerce_warned.add(uid)
            logger.warning(
                "continuous-only serving coerced %s for uid=%s (multi-host "
                "mode serves the continuous path only)",
                ", ".join(changed), uid,
            )
        return topts, chunk

    def _vad_for(self, uid: str, options: SessionOptions):
        from whisperlive_tpu.audio.vad import VoiceActivityDetector

        if uid not in self._vads:
            params = options.vad_parameters or {}
            self._vads[uid] = VoiceActivityDetector(
                threshold=params.get("threshold", self._vad_threshold)
            )
        return self._vads[uid]

    def release(self, uid: str) -> None:
        self._vads.pop(uid, None)
        self._prefix_cache.pop(uid, None)
        self._prefix_streak.pop(uid, None)
        self._rt_ema.pop(uid, None)

    def _adjust_options(
        self, topts: TranscribeOptions, chunk: np.ndarray
    ) -> TranscribeOptions:
        """Per-request option hook (benchmarks override it to emulate
        trained-weights decode lengths)."""
        return topts

    def _trim_prefix(self, tokens: Sequence[int]) -> tuple[int, ...]:
        """Stable-prefix trim of a previous hypothesis: drop trailing
        specials/timestamps, then the last few text tokens (the unstable
        zone next to the freshly arrived audio)."""
        eng = getattr(self.scheduler, "engine", None)
        if eng is None:
            return ()
        eot = eng.spec.eot
        toks = [int(t) for t in tokens]
        while toks and toks[-1] >= eot:
            toks.pop()
        toks = toks[:-4]
        return tuple(toks) if len(toks) >= 8 else ()

    async def transcribe(
        self,
        chunk: np.ndarray,
        options: SessionOptions,
        *,
        language: Optional[str] = None,
        previous_tokens: Sequence[int] = (),
        uid: str = "",
        include_unfinished: bool = True,
        window_anchor_s: Optional[float] = None,
        refresh_audio=None,
    ) -> Optional[BatchResult]:
        if options.use_vad:
            vad = self._vad_for(uid, options)
            # The gate re-scores the WHOLE un-committed tail every call
            # (chunks overlap as the tail grows), so stateful models must
            # start fresh each time — carrying GRU state across overlapping
            # audio corrupts the probabilities.
            vad.reset()
            if not vad(chunk):
                return None  # silence: nothing decoded, cursor stays

        topts = transcribe_options_from_session(
            options, language, beam_size=self.beam_size
        )
        topts = self._adjust_options(topts, chunk)
        # Resolve the incremental-prefix plan BEFORE routing: hybrid beam
        # mode splits on it (prefix windows decode greedy on the
        # continuous pool; full re-decodes keep the beam and route to the
        # window scheduler). Mutations are applied only after routing.
        prefix_eligible = (
            self.incremental
            and window_anchor_s is not None
            # the ring repetition penalty cannot see prompt-region prefix
            # tokens, so a non-default penalty would diverge from the
            # from-scratch decode it must reproduce — decode fully instead
            and topts.repetition_penalty == 1.0
        )
        prefix_plan: tuple | None = None  # ("use", toks)|("refresh",)|("evict",)
        if prefix_eligible and uid in self._prefix_cache:
            anchor, toks = self._prefix_cache[uid]
            if abs(anchor - window_anchor_s) < 1e-6:
                streak = self._prefix_streak.get(uid, 0)
                if self.prefix_refresh and streak >= self.prefix_refresh:
                    prefix_plan = ("refresh",)  # periodic full re-decode
                else:
                    prefix_plan = ("use", self._trim_prefix(toks))
            else:
                prefix_plan = ("evict",)  # commit moved the tail start
        is_tail = (
            prefix_plan is not None
            and prefix_plan[0] == "use"
            and bool(prefix_plan[1])
        )
        hybrid = self.hybrid_beam and topts.beam_size > 1
        if hybrid and is_tail:
            # greedy incremental partial; the beam rides the periodic
            # refresh + post-commit full re-decodes
            topts = dataclasses.replace(topts, beam_size=1)
        # Mixed speculative routing: full re-decodes (~100 steps) ride the
        # spec pool's verify rounds; short incremental tails stay plain.
        target_continuous = None
        if self.spec_scheduler is not None and not is_tail \
                and topts.beam_size <= 1:
            if self._spec_route():
                target_continuous = self.spec_scheduler
                self.spec_route_stats["spec_fulls"] += 1
            else:
                self.spec_route_stats["plain_fulls"] += 1
        if self.continuous_only and self.continuous_scheduler is not None:
            topts, chunk = self._coerce_to_continuous(topts, chunk, uid)
        req = BatchRequest(
            audio=chunk,
            options=topts,
            previous_tokens=tuple(previous_tokens),
            language=language,
            uid=uid,
            include_unfinished=include_unfinished,
        )
        scheduler = self._pick_scheduler(
            topts, len(chunk) / 16000.0, continuous=target_continuous
        )
        on_continuous = scheduler is self.continuous_scheduler or (
            self.spec_scheduler is not None
            and scheduler is self.spec_scheduler
        )
        if hybrid:
            key = "greedy_partials" if topts.beam_size == 1 else "beamed_fulls"
            self.hybrid_stats[key] += 1
        if on_continuous:
            # Late-bound audio: if the request queues behind a full slot
            # pool, the scheduler re-snapshots the stream's current tail at
            # slot-grant time (continuous.py::_rebind_audio) instead of
            # decoding the stale submit-time snapshot.
            req.refresh_audio = refresh_audio
        # hybrid full re-decodes run on the window scheduler but still
        # participate in the prefix cache — the beamed hypothesis is what
        # the greedy partials extend
        use_prefix = prefix_eligible and (on_continuous or hybrid)
        if use_prefix and prefix_plan is not None:
            kind = prefix_plan[0]
            if kind == "refresh":
                self._prefix_streak[uid] = 0
            elif kind == "use":
                if on_continuous:
                    req.prefix_tokens = prefix_plan[1]
                self._prefix_streak[uid] = (
                    self._prefix_streak.get(uid, 0) + 1
                    if req.prefix_tokens else 0
                )
            else:  # evict
                self._prefix_cache.pop(uid, None)
                self._prefix_streak.pop(uid, None)
        t_submit = time.monotonic()
        scheduler.submit(req)
        result = await asyncio.wait_for(
            asyncio.wrap_future(req.future), timeout=self.request_timeout_s
        )
        if on_continuous:
            rt = time.monotonic() - t_submit
            prev = self._rt_ema.get(uid, rt)
            self._rt_ema[uid] = prev + 0.3 * (rt - prev)
        if use_prefix and result is not None:
            if result.raw_tokens:
                self._prefix_cache[uid] = (window_anchor_s, result.raw_tokens)
            else:
                # empty raw_tokens on a prefix-eligible result = no-speech
                # skip or a decode whose final attempt failed the gates;
                # ALSO evict the previous entry — re-forcing the hypothesis
                # that just got implicated would repeat the doomed
                # prefix-decode + from-scratch retry every window
                self._prefix_cache.pop(uid, None)
                self._prefix_streak.pop(uid, None)
        return result


class FakeBackend:
    """Deterministic streaming transcriber: one word per second of audio.

    Used by the hermetic server/client tests and by `--fake_transcriber`
    (handy for protocol debugging without a model, and the analogue of the
    reference's mocked-transcriber test seam)."""

    def __init__(self, latency_s: float = 0.0):
        self.latency_s = latency_s

    async def transcribe(
        self,
        chunk: np.ndarray,
        options: SessionOptions,
        *,
        language: Optional[str] = None,
        previous_tokens: Sequence[int] = (),
        uid: str = "",
        include_unfinished: bool = True,
        window_anchor_s: Optional[float] = None,
        refresh_audio=None,
    ) -> BatchResult:
        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        duration = len(chunk) / 16000.0
        segments = []
        whole = int(duration)
        for i in range(whole):
            segments.append(
                SimpleNamespace(
                    start=float(i),
                    end=float(i + 1),
                    text=f" word{i}",
                    tokens=[],
                    no_speech_prob=0.0,
                    words=None,
                )
            )
        if duration > whole:
            segments.append(
                SimpleNamespace(
                    start=float(whole),
                    end=duration,
                    text=" partial",
                    tokens=[],
                    no_speech_prob=0.0,
                    words=None,
                )
            )
        return BatchResult(
            segments=segments,
            language=language or options.language or "en",
            language_prob=0.99,
            duration=duration,
            advance_s=duration,
        )
