"""Cross-stream batch scheduler: the one component that touches the TPU.

The TPU-native analogue of the reference's `BatchInferenceWorker`
(whisper_live/batch_inference.py): N sessions submit 30 s windows; a single
worker thread drains the queue, groups compatible requests into a fixed
batch-size bucket, and runs the engine's hot path: prepare (mel->encoder->
cross-KV) plus ONE fused language-ID+decode program. Differences by design:

  * Every shape is padded to a bucket — there are no ragged batches and so
    no recompilation as occupancy churns (the reference re-encodes ragged
    sub-batches per temperature).
  * The temperature-fallback sub-batching happens on-device via a cross-KV
    gather (engine.decode_with_fallback), not by re-running VAD+mel+encode
    per retry as the reference does (batch_inference.py:312-384).
  * Results resolve `concurrent.futures.Future`s, which bridge cleanly into
    the asyncio serving layer via `asyncio.wrap_future`.

Batch grouping key: requests only share a device batch when their logit
setup is batch-compatible (same suppress set). Per-item knobs — language,
task, prompt, timestamps on/off, temperature — are array inputs and mix
freely within a batch (mirroring batch_inference.py:273-310 per-item
prompts).
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence

import numpy as np

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.transcribe import (
    Segment,
    split_segments_by_timestamps,
)
from whisperlive_tpu.ops import mel as mel_ops
from whisperlive_tpu.utils import metrics as wl_metrics

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class BatchRequest:
    """One 30 s-window transcription request (cf. batch_inference.py:51-84)."""

    audio: np.ndarray  # float32 mono 16 kHz, <= 30 s (truncated if longer)
    options: TranscribeOptions
    previous_tokens: Sequence[int] = ()
    language: Optional[str] = None  # resolved language (None -> detect)
    uid: str = ""
    # Streaming sessions keep the unfinished trailing slice as the rolling
    # partial; offline/REST seek loops must drop it and re-decode from the
    # last closed timestamp (reference _split_segments_by_timestamps).
    include_unfinished: bool = True
    # Incremental partial decoding (continuous scheduler only): force the
    # previous window's hypothesis as a token-level decode prefix so only
    # the new tail is sampled. Timestamp tokens included; ignored by the
    # window scheduler and whenever options.prefix (user text) is set.
    prefix_tokens: Sequence[int] = ()
    # Late-bound audio (continuous scheduler only): called once at
    # slot-grant time to swap in the stream's CURRENT un-committed tail —
    # at oversubscription a request queues for seconds, and decoding the
    # submit-time snapshot would publish already-stale audio. Returns the
    # fresh tail (same anchor) or None to keep the snapshot. Ignored by
    # the window scheduler.
    refresh_audio: Optional[Callable[[], Optional[np.ndarray]]] = None
    audio_rebound: bool = False  # set by the scheduler after the one refresh
    # when the decoded window's audio was captured (refresh updates it);
    # the honest "newest content age" origin for latency metrics
    audio_bound_at: float = dataclasses.field(default_factory=time.monotonic)
    future: Future = dataclasses.field(default_factory=Future)
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)

    def group_key(self):
        # word_timestamps picks the split (alignment-capable) device path
        # and beam_size/patience pick the decode program (beam vs sampling)
        # and its static lane count, so batches must be homogeneous in
        # them. The scalar decode knobs (length/repetition penalty,
        # no_repeat_ngram, first temperature) are batch-global program
        # inputs taken from batch[0] — mixing them would silently decode
        # every item at the first request's settings.
        return (
            self.options.suppress_tokens,
            self.options.suppress_blank,
            self.options.word_timestamps,
            self.options.beam_size,
            self.options.patience,
            self.options.length_penalty,
            self.options.repetition_penalty,
            self.options.no_repeat_ngram_size,
            self.options.temperatures,
        )


@dataclasses.dataclass
class BatchResult:
    segments: list[Segment]
    language: str
    language_prob: float
    duration: float  # seconds of audio actually covered by this result
    # Seek feedback: seconds of input consumed by this decode (the offline
    # seek-loop advance, generate_segments semantics). Equals `duration`
    # when the window ended cleanly; less when trailing tokens were
    # unfinished and must be re-decoded from advance_s onward.
    advance_s: float = 0.0
    # Full decoded token stream (timestamps included) — the next window's
    # incremental prefix candidate (TpuBackend prefix cache).
    raw_tokens: tuple = ()
    # monotonic time the decoded window's audio was captured (the late-bound
    # refresh updates it at slot grant); `now - audio_bound_at` is the honest
    # staleness of the newest content in this result
    audio_bound_at: float = 0.0


def assemble_result(
    eng: WhisperEngine,
    req: BatchRequest,
    res,  # DecodeResult
    duration: float,
    language: str,
    language_prob: float,
    cross_kv=None,
    item_index: int = 0,
    prefix_ok: bool = True,
    cross_len: int | None = None,
    timings=None,
) -> BatchResult:
    """One decode result -> wire-ready BatchResult (no-speech skip, timestamp
    split, optional word alignment). Shared by the window-level and the
    continuous schedulers. `timings`: pre-computed word timings (multi-host
    serving runs the align program elsewhere so its device dispatch stays
    in the replayed op stream); when given, cross_kv is not touched."""
    segments: list[Segment] = []
    advance_s = duration
    skip = (
        req.options.no_speech_threshold is not None
        and res.no_speech_prob > req.options.no_speech_threshold
        and (
            req.options.log_prob_threshold is None
            or res.avg_logprob < req.options.log_prob_threshold
        )
    )
    if not skip:
        segment_size = int(duration * 100)  # mel frames
        pieces, advance, _ = split_segments_by_timestamps(
            eng.spec, res.tokens, 0.0, duration, segment_size,
            include_unfinished=req.include_unfinished,
        )
        advance_s = min(advance / 100.0, duration)
        if req.options.word_timestamps and timings is None \
                and cross_kv is not None:
            try:
                timings = eng.align_words(
                    cross_kv, item_index, res.tokens, segment_size,
                    cross_len=cross_len,
                    language=language, task=req.options.task,
                )
            except Exception:
                logger.exception("word alignment failed")
        for j, (start, end, toks) in enumerate(pieces):
            text = eng.tokenizer.decode(toks)
            if not text.strip():
                continue
            words = None
            if timings is not None:
                from whisperlive_tpu.engine.align import (
                    is_segment_anomaly,
                    words_for_segment,
                )

                words = words_for_segment(timings, start, end)
                if (
                    req.options.hallucination_silence_threshold is not None
                    and is_segment_anomaly(words)
                ):
                    logger.info(
                        "[%s] dropping hallucination-suspect segment %r",
                        req.uid, text[:40],
                    )
                    continue
            segments.append(
                Segment(
                    id=j,
                    seek=0,
                    start=start,
                    end=end,
                    text=text,
                    tokens=toks,
                    temperature=res.temperature,
                    avg_logprob=res.avg_logprob,
                    compression_ratio=res.compression_ratio,
                    no_speech_prob=res.no_speech_prob,
                    words=words,
                )
            )
    return BatchResult(
        segments=segments,
        language=language,
        language_prob=language_prob,
        duration=duration,
        advance_s=advance_s,
        # a no-speech skip means the decoded stream is hallucination over
        # silence, and a decode whose final attempt still failed the
        # quality gates is a known-bad hypothesis — neither may seed the
        # next window's forced prefix
        raw_tokens=(
            () if (skip or not prefix_ok)
            else tuple(int(t) for t in res.tokens)
        ),
        audio_bound_at=req.audio_bound_at,
    )


class BatchScheduler:
    """Single worker thread owning the engine (batch_inference.py:126-187)."""

    def __init__(
        self,
        engine: WhisperEngine,
        max_batch_size: int = 8,
        batch_window_ms: float = 50.0,
        spec_decoder=None,
    ):
        """spec_decoder: optional engine.speculative.SpeculativeDecoder —
        single-request greedy batches (low-traffic REST/offline serving)
        then decode draft-accelerated, token-exact vs the plain program."""
        self.engine = engine
        self.max_batch_size = max_batch_size
        self.batch_window_ms = batch_window_ms
        self.spec_decoder = spec_decoder
        self._queue: "queue.Queue[Optional[BatchRequest]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._seed = 0

    # ------------------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._thread = threading.Thread(
            target=self._worker_loop, name="tpu-batch-scheduler", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def submit(self, request: BatchRequest) -> Future:
        self._queue.put(request)
        return request.future

    # ------------------------------------------------------------------

    def _collect_batch(self) -> list[BatchRequest]:
        """Block for the first request, then drain compatible requests for
        up to batch_window_ms (batch_inference.py:155-187)."""
        first = self._queue.get()
        if first is None or self._stop.is_set():
            return []
        batch = [first]
        deadline = time.monotonic() + self.batch_window_ms / 1000.0
        leftovers: list[BatchRequest] = []
        while len(batch) < self.max_batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                break
            if req.group_key() == first.group_key():
                batch.append(req)
            else:
                leftovers.append(req)
        for req in leftovers:
            self._queue.put(req)
        return batch

    def _worker_loop(self) -> None:
        logger.info("batch scheduler started (max_batch=%d window=%.0fms)",
                    self.max_batch_size, self.batch_window_ms)
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                self._process_batch(batch)
            except Exception as e:  # worker must survive (tested behavior)
                logger.exception("batch processing failed")
                wl_metrics.track_error("batch_processing")
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
        logger.info("batch scheduler stopped")

    # ------------------------------------------------------------------

    def _process_batch(self, batch: list[BatchRequest]) -> None:
        eng = self.engine
        t0 = time.monotonic()
        n = len(batch)

        durations = []
        audio = np.zeros((n, mel_ops.N_SAMPLES), np.float32)
        for i, req in enumerate(batch):
            a = req.audio[: mel_ops.N_SAMPLES]
            audio[i, : len(a)] = a
            durations.append(len(a) / mel_ops.SAMPLE_RATE)

        # Pad batch dim to a bucket so occupancy churn reuses one program.
        from whisperlive_tpu.engine.engine import _bucket, fails_quality_gates

        bucket = _bucket(n, eng.batch_buckets)
        if bucket > n:
            audio = np.concatenate(
                [audio, np.zeros((bucket - n, mel_ops.N_SAMPLES), np.float32)]
            )

        languages: list[Optional[str]] = [
            req.language or req.options.language for req in batch
        ]
        lang_known = [lang is not None for lang in languages]
        language_probs = [1.0] * n
        prompts, sot_idx = [], []
        for i, req in enumerate(batch):
            # unknown language: build with a placeholder token; the fused
            # program splices the detected language token in on device
            p, s = eng.build_prompt(
                req.options,
                previous_tokens=req.previous_tokens,
                language=languages[i] or "en",
            )
            prompts.append(p)
            sot_idx.append(s)

        self._seed += 1
        need_align = batch[0].options.word_timestamps
        options0 = batch[0].options
        # Beamed batches must take the split path: the fused detect+decode
        # program is the SAMPLING loop (greedy at T=0) with no beam
        # expansion, so routing beam_size>1 through it would silently
        # serve greedy output at beam-quality billing
        # (test_scheduler::test_beam_request_runs_beam_program). The split
        # path's decode_with_fallback runs the batched beam program at
        # T=0 and escalates to sampling on retries — the reference's
        # beam->sampling fallback policy.
        need_split = need_align or options0.beam_size > 1
        cross_kv = None
        used_spec = False
        if (
            self.spec_decoder is not None
            and n == 1
            and not need_align  # word-ts alignment stays on the split path
            and options0.beam_size == 1
            and options0.temperatures
            and options0.temperatures[0] == 0.0
            and eng.batch_buckets[0] == 1
        ):
            # Speculative route: a lone greedy request (low-traffic REST /
            # offline serving) decodes draft-accelerated — the verify pass
            # reads the per-token HBM state once per k+1 tokens. Token-
            # exact vs the fused program by construction (test-pinned), so
            # routing here never changes output, only latency.
            enc, cross_kv = eng.prepare(audio[:1])
            if languages[0] is None and eng.tokenizer.spec.multilingual:
                ((languages[0], language_probs[0]),) = (
                    eng.detect_language_from_cross(cross_kv)
                )
                prompts[0], sot_idx[0] = eng.build_prompt(
                    options0,
                    previous_tokens=batch[0].previous_tokens,
                    language=languages[0],
                )
            cross_d = self.spec_decoder.cross_from_enc(enc)
            results = self.spec_decoder.decode_with_fallback(
                cross_kv, cross_d, prompts[0], sot_idx[0], options0,
                seed=self._seed,
            )
            used_spec = True
        elif need_split:
            # Split path: word-timestamp alignment reuses the window's
            # cross-KV (so it must stay addressable outside the program),
            # and beamed decodes run the dedicated beam program.
            _, cross_kv = eng.prepare(audio)
            if not all(lang_known) and eng.tokenizer.spec.multilingual:
                det = eng.detect_language_from_cross(cross_kv)
                for i in range(n):
                    if languages[i] is None:
                        languages[i], language_probs[i] = det[i]
                        prompts[i], sot_idx[i] = eng.build_prompt(
                            batch[i].options,
                            previous_tokens=batch[i].previous_tokens,
                            language=languages[i],
                        )
            results = eng.decode_with_fallback(
                cross_kv, prompts, sot_idx, batch[0].options, seed=self._seed
            )
        else:
            # Common case: attempt 1 is ONE fused device program (mel ->
            # encoder -> language ID -> prompt splice -> decode). Per-program
            # dispatch overhead through the serving transport is substantial,
            # so the hot path pays it once per batch.
            results, detected, cross_kv = eng.transcribe_batch(
                audio, prompts, sot_idx, lang_known, batch[0].options,
                seed=self._seed,
            )
            for i in range(n):
                if languages[i] is None:
                    languages[i], language_probs[i] = detected[i]

        # Temperature-fallback retries for gate failures (rare with trained
        # weights): split path, re-encoding only the failing sub-batch —
        # still cheaper than the reference, which re-runs VAD+mel+encode on
        # every retry (batch_inference.py:312-384).
        options = batch[0].options
        retry_temps = options.temperatures[1:]
        failed = (
            []
            # split/speculative paths already ran the full fallback cascade
            if need_split or used_spec
            else [i for i in range(n) if fails_quality_gates(options, results[i])]
        )
        if failed and retry_temps:
            import dataclasses as _dc
            import jax
            import jax.numpy as jnp

            retry_bucket = _bucket(len(failed), eng.batch_buckets)
            idx = jnp.asarray((failed + [failed[-1]] * retry_bucket)[:retry_bucket])
            cross_sub = jax.tree.map(lambda a: jnp.take(a, idx, axis=2), cross_kv)
            retry_prompts = []
            retry_sots = []
            for i in failed:
                p, s = eng.build_prompt(
                    batch[i].options,
                    previous_tokens=batch[i].previous_tokens,
                    language=languages[i],
                )
                retry_prompts.append(p)
                retry_sots.append(s)
            retry_opts = _dc.replace(options, temperatures=retry_temps)
            retry_results = eng.decode_with_fallback(
                cross_sub, retry_prompts, retry_sots, retry_opts, seed=self._seed
            )
            for j, i in enumerate(failed):
                results[i] = retry_results[j]

        for i, (req, res) in enumerate(zip(batch, results)):
            try:
                req.future.set_result(
                    assemble_result(
                        eng, req, res, durations[i],
                        language=languages[i] or "en",
                        language_prob=language_probs[i],
                        cross_kv=cross_kv,
                        item_index=i,
                    )
                )
            except Exception as e:
                if not req.future.done():
                    req.future.set_exception(e)

        dt = time.monotonic() - t0
        wl_metrics.track_batch_occupancy(n)
        wl_metrics.track_transcription_latency(dt)
        wl_metrics.track_audio_seconds(sum(durations))
        logger.debug("batch of %d done in %.0f ms", n, dt * 1e3)
