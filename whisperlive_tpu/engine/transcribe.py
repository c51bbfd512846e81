"""High-level transcription: seek loop, timestamp segmentation, segments.

The behavioral twin of the reference's vendored faster-whisper pipeline
(`WhisperModel.transcribe` + `generate_segments`,
transcriber_faster_whisper.py:692-968, 1049-1337): 30 s windowed decoding
with temperature fallback, timestamp-token segmentation, no-speech gating,
condition-on-previous-text prompting — but the device work (mel, encoder,
sampling loop) is the fixed-shape batched engine, so this layer is pure
host-side orchestration on numpy token arrays.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import NamedTuple, Optional

import numpy as np

from whisperlive_tpu.engine.engine import (
    DecodeResult,
    TranscribeOptions,
    WhisperEngine,
)
from whisperlive_tpu.ops import mel as mel_ops

logger = logging.getLogger(__name__)

# Whisper timing constants (transcriber_faster_whisper.py:656-667)
INPUT_STRIDE = 2  # mel frames per encoder position
FRAMES_PER_SECOND = 100
TOKENS_PER_SECOND = 50
TIME_PRECISION = 0.02


@dataclasses.dataclass
class Word:
    start: float
    end: float
    word: str
    probability: float


@dataclasses.dataclass
class Segment:
    """Mirrors faster_whisper.Segment (transcriber_faster_whisper.py:43-59)."""

    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float
    words: Optional[list[Word]] = None


class TranscriptionInfo(NamedTuple):
    language: str
    language_probability: float
    duration: float
    transcription_options: TranscribeOptions
    all_language_probs: Optional[list[tuple[str, float]]] = None


def split_segments_by_timestamps(
    spec,
    tokens: np.ndarray,
    time_offset: float,
    window_duration: float,
    segment_size_frames: int,
    include_unfinished: bool = False,
) -> tuple[list[tuple[float, float, list[int]]], int]:
    """Split one window's sampled tokens at timestamp boundaries.

    Port of the seek-advance semantics of _split_segments_by_timestamps
    (transcriber_faster_whisper.py:970-1047). Returns
    ([(start_s, end_s, tokens)], seek_advance_frames).

    include_unfinished: streaming-only mode — also emit the unfinished
    trailing slice (tokens after the last closed timestamp pair) as a final
    segment ending at the window edge. The offline seek loop must NOT use
    this (the tail is re-decoded next window, reference drops it); the
    streaming scheduler does, because its per-cycle decode is one window and
    the session layer needs the in-flight tail as the incomplete partial.
    """
    tb = spec.timestamp_begin
    toks = [int(t) for t in tokens]
    single = []

    # True when the window's output ends on a lone timestamp (no speech
    # after it): transcriber_faster_whisper.py:980-982.
    ended_with_single = (
        len(toks) >= 2 and toks[-2] < tb <= toks[-1]
    )
    consecutive = [
        i + 1
        for i in range(len(toks) - 1)
        if toks[i] >= tb and toks[i + 1] >= tb
    ]
    segments: list[tuple[float, float, list[int]]] = []
    if consecutive:
        # Boundaries at each consecutive-timestamp pair. On a single-
        # timestamp ending the trailing slice IS a finished segment (emit it
        # and advance the full window); otherwise trailing tokens are
        # unfinished — drop them and rewind seek to the last closed
        # timestamp so the next window re-decodes them
        # (transcriber_faster_whisper.py:992-1025).
        bounds = list(consecutive)
        if ended_with_single:
            bounds.append(len(toks))
        for a, b in zip([0] + bounds[:-1], bounds):
            piece = toks[a:b]
            if not piece:
                continue
            start_ts = piece[0] - tb if piece[0] >= tb else 0
            end_ts = piece[-1] - tb if piece[-1] >= tb else start_ts
            segments.append(
                (
                    time_offset + start_ts * TIME_PRECISION,
                    time_offset + end_ts * TIME_PRECISION,
                    piece,
                )
            )
        if ended_with_single:
            return segments, segment_size_frames
        if include_unfinished and bounds[-1] < len(toks):
            piece = toks[bounds[-1]:]
            start_ts = piece[0] - tb if piece[0] >= tb else 0
            segments.append(
                (
                    time_offset + start_ts * TIME_PRECISION,
                    time_offset + window_duration,
                    piece,
                )
            )
        last_close = toks[bounds[-1] - 1]
        seek_advance = (last_close - tb) * INPUT_STRIDE
        return segments, max(seek_advance, 1)

    # No consecutive pair: one segment spanning the window; if the output
    # ends with a lone timestamp, it bounds the duration.
    duration = window_duration
    ts_tokens = [t for t in toks if t >= tb]
    if ts_tokens and ts_tokens[-1] != tb:
        duration = (ts_tokens[-1] - tb) * TIME_PRECISION
    single = [(time_offset, time_offset + duration, toks)]
    return single, segment_size_frames


class Transcriber:
    """Sequential (single-request) transcribe API over the engine.

    The streaming server uses the batched scheduler instead; this class
    provides the REST/offline path and the behavioral reference for tests.
    """

    def __init__(self, engine: WhisperEngine):
        self.engine = engine

    def transcribe(
        self,
        audio: np.ndarray,
        options: TranscribeOptions | None = None,
        seed: int = 0,
        vad_filter: bool = False,
        vad_parameters: Optional[dict] = None,
    ) -> tuple[list[Segment], TranscriptionInfo]:
        """audio: float32 mono 16 kHz. Returns (segments, info).

        vad_filter collapses silence before decoding and restores original
        timestamps afterwards (WhisperModel.transcribe's vad_filter path,
        transcriber_faster_whisper.py:830-856, 1792-1817).
        """
        options = options or TranscribeOptions()
        if vad_filter:
            from whisperlive_tpu.audio.vad import (
                SpeechTimestampsMap,
                VadOptions,
                collect_chunks,
                get_speech_timestamps,
            )

            full_duration = len(audio) / mel_ops.SAMPLE_RATE
            opts = VadOptions(**(vad_parameters or {}))
            chunks = get_speech_timestamps(audio, opts)
            if not chunks:
                return [], TranscriptionInfo(
                    language=options.language or "en",
                    language_probability=1.0,
                    duration=full_duration,
                    transcription_options=options,
                )
            ts_map = SpeechTimestampsMap(chunks)
            segments, info = self.transcribe(
                collect_chunks(audio, chunks), options, seed=seed
            )
            for s in segments:
                idx = ts_map.get_chunk_index(s.start)
                s.start = ts_map.get_original_time(s.start, idx)
                s.end = max(ts_map.get_original_time(s.end, idx), s.start)
                if s.words:
                    for w in s.words:
                        wi = ts_map.get_chunk_index(w.start)
                        w.start = ts_map.get_original_time(w.start, wi)
                        w.end = max(ts_map.get_original_time(w.end, wi), w.start)
            return segments, info._replace(duration=full_duration)

        eng = self.engine
        spec = eng.spec
        duration = len(audio) / mel_ops.SAMPLE_RATE

        content_frames = int(len(audio) / mel_ops.HOP_LENGTH)
        seek = 0
        all_segments: list[Segment] = []
        all_tokens: list[int] = []
        language = options.language
        language_prob = 1.0
        prompt_reset_since = 0
        seg_id = 0
        last_ns_prob = 0.0

        while seek < content_frames:
            time_offset = seek * mel_ops.HOP_LENGTH / mel_ops.SAMPLE_RATE
            window = audio[seek * mel_ops.HOP_LENGTH :][: mel_ops.N_SAMPLES]
            segment_size = min(
                mel_ops.N_FRAMES, content_frames - seek
            )
            window_duration = segment_size * mel_ops.HOP_LENGTH / mel_ops.SAMPLE_RATE
            padded = mel_ops.pad_or_trim(window)[None, :]

            _, cross_kv = eng.prepare(padded)
            if language is None:
                (language, language_prob), = eng.detect_language_from_cross(cross_kv)
                logger.info("detected language %s (p=%.2f)", language, language_prob)

            prompt, sot_idx = eng.build_prompt(
                options,
                previous_tokens=all_tokens[prompt_reset_since:],
                language=language,
            )
            (result,) = eng.decode_with_fallback(
                cross_kv, [prompt], [sot_idx], options, seed=seed
            )
            last_ns_prob = result.no_speech_prob

            # No-speech skip (transcriber_faster_whisper.py:1156-1175):
            # requires BOTH high no-speech prob and failed logprob.
            if (
                options.no_speech_threshold is not None
                and result.no_speech_prob > options.no_speech_threshold
                and (
                    options.log_prob_threshold is None
                    or result.avg_logprob < options.log_prob_threshold
                )
            ):
                seek += segment_size
                continue

            pieces, advance = split_segments_by_timestamps(
                spec, result.tokens, time_offset, window_duration, segment_size
            )
            seek += advance

            for start, end, toks in pieces:
                text = eng.tokenizer.decode(toks)
                if not text.strip():
                    continue
                all_segments.append(
                    Segment(
                        id=seg_id,
                        seek=seek,
                        start=start,
                        end=min(end, duration) if end > duration and start < duration else end,
                        text=text,
                        tokens=toks,
                        temperature=result.temperature,
                        avg_logprob=result.avg_logprob,
                        compression_ratio=result.compression_ratio,
                        no_speech_prob=result.no_speech_prob,
                    )
                )
                seg_id += 1
                all_tokens.extend(t for t in toks if t < spec.eot)

            if not options.condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

        info = TranscriptionInfo(
            language=language or "en",
            language_probability=language_prob,
            duration=duration,
            transcription_options=options,
        )
        return all_segments, info


class BatchedTranscriber:
    """Offline batched transcription of many files (the capability of the
    reference's BatchedInferencePipeline, transcriber_faster_whisper.py:
    113-571): each file's current 30 s window joins one device batch; files
    advance their seek cursors independently until all are exhausted."""

    def __init__(self, engine: WhisperEngine):
        self.engine = engine

    def transcribe(
        self,
        audios: list[np.ndarray],
        options: TranscribeOptions | None = None,
        seed: int = 0,
    ) -> list[tuple[list[Segment], TranscriptionInfo]]:
        options = options or TranscribeOptions()
        eng = self.engine
        n = len(audios)
        seeks = [0] * n
        all_segments: list[list[Segment]] = [[] for _ in range(n)]
        all_tokens: list[list[int]] = [[] for _ in range(n)]
        languages: list[Optional[str]] = [options.language] * n
        language_probs = [1.0] * n
        seg_ids = [0] * n

        def active_items():
            return [
                i for i in range(n)
                if seeks[i] < int(len(audios[i]) / mel_ops.HOP_LENGTH)
            ]

        while True:
            active = active_items()
            if not active:
                break
            windows = []
            for i in active:
                windows.append(
                    mel_ops.pad_or_trim(
                        audios[i][seeks[i] * mel_ops.HOP_LENGTH :][: mel_ops.N_SAMPLES]
                    )
                )
            from whisperlive_tpu.engine.engine import _bucket

            bucket = _bucket(len(active), eng.batch_buckets)
            batch = np.zeros((bucket, mel_ops.N_SAMPLES), np.float32)
            for j, w in enumerate(windows):
                batch[j] = w
            _, cross = eng.prepare(batch)

            if any(languages[i] is None for i in active):
                detected = eng.detect_language_from_cross(cross)
                for j, i in enumerate(active):
                    if languages[i] is None:
                        languages[i], language_probs[i] = detected[j]

            prompts, sots = [], []
            for i in active:
                p, s = eng.build_prompt(
                    options, previous_tokens=all_tokens[i][-224:],
                    language=languages[i],
                )
                prompts.append(p)
                sots.append(s)
            results = eng.decode_with_fallback(
                cross, prompts, sots, options, seed=seed
            )

            for j, i in enumerate(active):
                res = results[j]
                content_frames = int(len(audios[i]) / mel_ops.HOP_LENGTH)
                segment_size = min(mel_ops.N_FRAMES, content_frames - seeks[i])
                time_offset = seeks[i] * mel_ops.HOP_LENGTH / mel_ops.SAMPLE_RATE
                window_duration = segment_size * mel_ops.HOP_LENGTH / mel_ops.SAMPLE_RATE
                skip = (
                    options.no_speech_threshold is not None
                    and res.no_speech_prob > options.no_speech_threshold
                    and (
                        options.log_prob_threshold is None
                        or res.avg_logprob < options.log_prob_threshold
                    )
                )
                if skip:
                    seeks[i] += segment_size
                    continue
                pieces, advance = split_segments_by_timestamps(
                    eng.spec, res.tokens, time_offset, window_duration, segment_size
                )
                seeks[i] += advance
                for start, end, toks in pieces:
                    text = eng.tokenizer.decode(toks)
                    if not text.strip():
                        continue
                    all_segments[i].append(
                        Segment(
                            id=seg_ids[i], seek=seeks[i], start=start, end=end,
                            text=text, tokens=toks,
                            temperature=res.temperature,
                            avg_logprob=res.avg_logprob,
                            compression_ratio=res.compression_ratio,
                            no_speech_prob=res.no_speech_prob,
                        )
                    )
                    seg_ids[i] += 1
                    all_tokens[i].extend(t for t in toks if t < eng.spec.eot)

        return [
            (
                all_segments[i],
                TranscriptionInfo(
                    language=languages[i] or "en",
                    language_probability=language_probs[i],
                    duration=len(audios[i]) / mel_ops.SAMPLE_RATE,
                    transcription_options=options,
                ),
            )
            for i in range(n)
        ]
