"""OpenAI-compatible REST API (reference: server.py:490-598, 692-867).

`POST /v1/audio/transcriptions` with multipart upload, response_format in
{json, text, srt, verbose_json, vtt}, SSE streaming (`stream=true`),
Bearer-token auth, per-IP sliding-window rate limiting and CORS — on
aiohttp (the reference uses FastAPI/uvicorn in a daemon thread; here the
REST app shares the server's event loop and the same batch scheduler, so
REST requests batch together with live streams on the TPU).
"""

from __future__ import annotations

import json
import logging
import time
import uuid
from collections import defaultdict, deque
from typing import Optional

import numpy as np

from whisperlive_tpu.serving.session import SessionOptions
from whisperlive_tpu.utils import metrics as wl_metrics
from whisperlive_tpu.utils.text import segments_to_srt, segments_to_vtt

logger = logging.getLogger(__name__)

WINDOW_S = 30.0
SAMPLE_RATE = 16_000


class RateLimiter:
    """Per-IP sliding window (server.py:713-730)."""

    def __init__(self, rpm: int):
        self.rpm = rpm
        self.hits: dict[str, deque] = defaultdict(deque)

    def allow(self, ip: str) -> bool:
        if self.rpm <= 0:
            return True
        now = time.monotonic()
        q = self.hits[ip]
        while q and now - q[0] > 60.0:
            q.popleft()
        if len(q) >= self.rpm:
            return False
        q.append(now)
        return True


async def _transcribe_full(
    backend,
    audio: np.ndarray,
    options: SessionOptions,
    language: Optional[str],
):
    """Timestamp-driven seek-loop transcription of a whole file through the
    shared backend (windows from different REST requests and live streams
    batch together on the device). The seek cursor advances by the decode's
    own feedback (BatchResult.advance_s — the reference's generate_segments
    semantics, transcriber_faster_whisper.py:1104-1127), so speech that
    straddles a window boundary is re-decoded from the last closed
    timestamp instead of being clipped at a fixed 30 s edge."""
    segments_out = []
    previous_tokens: list[int] = []
    detected_language = language
    offset = 0
    uid = f"rest-{uuid.uuid4()}"
    try:
        while offset < len(audio):
            window = audio[offset : offset + int(WINDOW_S * SAMPLE_RATE)]
            result = await backend.transcribe(
                window,
                options,
                language=detected_language,
                previous_tokens=previous_tokens,
                uid=uid,
                include_unfinished=False,
            )
            t0 = offset / SAMPLE_RATE
            advance_s = WINDOW_S
            if result is not None:
                detected_language = detected_language or result.language
                # floor of 1 s bounds worst-case work on pathological output
                advance_s = max(result.advance_s, 1.0)
                for s in result.segments:
                    seg_dict = {
                        "start": t0 + s.start,
                        "end": t0 + s.end,
                        "text": s.text,
                        "tokens": list(getattr(s, "tokens", [])),
                        "avg_logprob": getattr(s, "avg_logprob", 0.0),
                        "no_speech_prob": getattr(s, "no_speech_prob", 0.0),
                        "compression_ratio": getattr(s, "compression_ratio", 0.0),
                        "temperature": getattr(s, "temperature", 0.0),
                    }
                    words = getattr(s, "words", None)
                    if words:
                        seg_dict["words"] = [
                            {
                                "start": t0 + w.start,
                                "end": t0 + w.end,
                                "word": w.word,
                                "probability": w.probability,
                            }
                            for w in words
                        ]
                    segments_out.append(seg_dict)
                    previous_tokens.extend(getattr(s, "tokens", []))
            previous_tokens = previous_tokens[-224:]
            offset += int(advance_s * SAMPLE_RATE)
    finally:
        if hasattr(backend, "release"):
            backend.release(uid)
    return segments_out, (detected_language or "en")


def _format_response(segments, language, duration, response_format):
    text = "".join(s["text"] for s in segments).strip()
    if response_format == "text":
        return "text/plain", text
    if response_format == "srt":
        srt_segs = [
            {"start": s["start"], "end": s["end"], "text": s["text"]} for s in segments
        ]
        return "text/plain", segments_to_srt(srt_segs)
    if response_format == "vtt":
        vtt_segs = [
            {"start": s["start"], "end": s["end"], "text": s["text"]} for s in segments
        ]
        return "text/plain", segments_to_vtt(vtt_segs)
    if response_format == "verbose_json":
        return "application/json", json.dumps(
            {
                "task": "transcribe",
                "language": language,
                "duration": duration,
                "text": text,
                "segments": [
                    {
                        "id": i,
                        "seek": 0,
                        "start": s["start"],
                        "end": s["end"],
                        "text": s["text"],
                        "tokens": s["tokens"],
                        "temperature": s["temperature"],
                        "avg_logprob": s["avg_logprob"],
                        "compression_ratio": s["compression_ratio"],
                        "no_speech_prob": s["no_speech_prob"],
                        **({"speaker": s["speaker"]} if "speaker" in s else {}),
                        **({"words": s["words"]} if "words" in s else {}),
                    }
                    for i, s in enumerate(segments)
                ],
            }
        )
    return "application/json", json.dumps({"text": text})


async def start_rest_server(
    backend,
    port: int,
    host: str = "0.0.0.0",
    cors_origins: Optional[list[str]] = None,
    api_key: Optional[str] = None,
    rate_limit_rpm: int = 0,
):
    """Start the aiohttp app on the current loop; returns the runner."""
    from aiohttp import web

    limiter = RateLimiter(rate_limit_rpm)
    origins = cors_origins or ["*"]

    @web.middleware
    async def middleware(request, handler):
        # CORS preflight
        if request.method == "OPTIONS":
            resp = web.Response(status=204)
        else:
            # auth (server.py:705-711)
            if api_key and request.path.startswith("/v1/"):
                auth = request.headers.get("Authorization", "")
                if auth != f"Bearer {api_key}":
                    wl_metrics.track_rest_request(request.path, 401)
                    return web.json_response(
                        {"error": "invalid or missing API key"}, status=401
                    )
            # rate limit (server.py:713-730)
            ip = request.remote or "unknown"
            if request.path.startswith("/v1/") and not limiter.allow(ip):
                wl_metrics.track_rest_request(request.path, 429)
                return web.json_response({"error": "rate limit exceeded"}, status=429)
            try:
                resp = await handler(request)
            except web.HTTPException as e:
                resp = e
        origin = request.headers.get("Origin")
        if origin and ("*" in origins or origin in origins):
            resp.headers["Access-Control-Allow-Origin"] = origin if "*" not in origins else "*"
            resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
            resp.headers["Access-Control-Allow-Headers"] = "Authorization, Content-Type"
        return resp

    async def health(request):
        return web.json_response({"status": "ok"})

    async def transcriptions(request):
        t0 = time.monotonic()
        try:
            reader = await request.multipart()
        except Exception:
            wl_metrics.track_rest_request("/v1/audio/transcriptions", 400)
            return web.json_response({"error": "expected multipart form data"}, status=400)

        fields: dict[str, str] = {}
        file_bytes = b""
        filename = "audio.wav"
        known_speakers: list[tuple[str, bytes]] = []
        speaker_names: list[str] = []
        async for part in reader:
            if part.name == "file":
                filename = part.filename or filename
                file_bytes = await part.read(decode=False)
            elif part.name in ("known_speaker_files", "known_speaker_files[]"):
                known_speakers.append(
                    (part.filename or f"speaker_{len(known_speakers)}",
                     await part.read(decode=False))
                )
            elif part.name in ("known_speaker_names", "known_speaker_names[]"):
                speaker_names.append(
                    (await part.read(decode=False)).decode("utf-8", "replace")
                )
            else:
                fields[part.name] = (await part.read(decode=False)).decode("utf-8", "replace")

        if not file_bytes:
            wl_metrics.track_rest_request("/v1/audio/transcriptions", 400)
            return web.json_response({"error": "missing file"}, status=400)

        # decode upload (WAV/FLAC natively; raw PCM f32 fallback)
        from whisperlive_tpu.audio import io as audio_io

        try:
            if filename.lower().endswith(".flac") or file_bytes[:4] == b"fLaC":
                from whisperlive_tpu.audio.flac import read_flac_bytes

                audio, sr = read_flac_bytes(file_bytes)
                audio = audio_io.resample_audio(audio, sr)
            elif filename.lower().endswith(".wav") or file_bytes[:4] == b"RIFF":
                audio, sr = audio_io.read_wav(file_bytes)
                audio = audio_io.resample_audio(audio, sr)
            else:
                audio = np.frombuffer(file_bytes, np.float32).copy()
        except Exception as e:
            wl_metrics.track_rest_request("/v1/audio/transcriptions", 400)
            return web.json_response({"error": f"cannot decode audio: {e}"}, status=400)

        language = fields.get("language") or None
        response_format = fields.get("response_format", "json")
        if response_format not in ("json", "text", "srt", "verbose_json", "vtt"):
            wl_metrics.track_rest_request("/v1/audio/transcriptions", 400)
            return web.json_response(
                {"error": f"unsupported response_format {response_format!r}"}, status=400
            )
        options = SessionOptions(
            language=language,
            initial_prompt=fields.get("prompt") or None,
            hotwords=fields.get("hotwords") or None,
            word_timestamps="word" in fields.get("timestamp_granularities", ""),
            use_vad=fields.get("use_vad", "true").lower() != "false",
        )
        stream = fields.get("stream", "").lower() == "true"
        duration = len(audio) / SAMPLE_RATE

        if stream:
            # SSE streaming (server.py:490-537)
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            previous_tokens: list[int] = []
            uid = f"rest-{uuid.uuid4()}"
            offset = 0
            detected = language
            try:
                while offset < len(audio):
                    window = audio[offset : offset + int(WINDOW_S * SAMPLE_RATE)]
                    result = await backend.transcribe(
                        window, options, language=detected,
                        previous_tokens=previous_tokens, uid=uid,
                        include_unfinished=False,
                    )
                    advance_s = WINDOW_S
                    if result is not None:
                        detected = detected or result.language
                        advance_s = max(result.advance_s, 1.0)
                        for s in result.segments:
                            event = {
                                "text": s.text,
                                "start": offset / SAMPLE_RATE + s.start,
                                "end": offset / SAMPLE_RATE + s.end,
                            }
                            await resp.write(f"data: {json.dumps(event)}\n\n".encode())
                            previous_tokens.extend(getattr(s, "tokens", []))
                    previous_tokens = previous_tokens[-224:]
                    offset += int(advance_s * SAMPLE_RATE)
            finally:
                if hasattr(backend, "release"):
                    backend.release(uid)
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            wl_metrics.track_rest_request("/v1/audio/transcriptions", 200)
            return resp

        segments, detected = await _transcribe_full(backend, audio, options, language)

        # Known-speaker diarization (server.py:550-598, 812-821): enroll the
        # uploaded reference voices, then label each segment.
        if known_speakers:
            from whisperlive_tpu.diarization import SpeakerDiarizer

            # REST is offline/batch: the quality embedder's ~0.2 s/segment
            # is fine here (streaming sessions keep the cheap MLP)
            diarizer = SpeakerDiarizer(
                max_speakers=max(len(known_speakers), 4), quality=True
            )
            for i, (fname, raw) in enumerate(known_speakers):
                name = speaker_names[i] if i < len(speaker_names) else fname
                try:
                    if raw[:4] == b"fLaC":
                        from whisperlive_tpu.audio.flac import read_flac_bytes

                        ref_audio, ref_sr = read_flac_bytes(raw)
                    else:
                        ref_audio, ref_sr = audio_io.read_wav(raw)
                    diarizer.enroll_speaker(
                        name, audio_io.resample_audio(ref_audio, ref_sr)
                    )
                except Exception:
                    logger.exception("failed to enroll speaker %s", name)
            for s in segments:
                a = audio[int(s["start"] * SAMPLE_RATE): int(s["end"] * SAMPLE_RATE)]
                label = diarizer.identify_speaker(a)
                if label is not None:
                    s["speaker"] = label

        ctype, body = _format_response(segments, detected, duration, response_format)
        wl_metrics.track_rest_request("/v1/audio/transcriptions", 200)
        logger.info("REST transcription done in %.2fs (%.1fs audio)",
                    time.monotonic() - t0, duration)
        return web.Response(text=body, content_type=ctype)

    app = web.Application(middlewares=[middleware], client_max_size=512 * 1024 * 1024)
    app.router.add_get("/health", health)
    app.router.add_post("/v1/audio/transcriptions", transcriptions)
    app.router.add_route("OPTIONS", "/v1/audio/transcriptions", transcriptions)

    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    logger.info("REST API listening on %s:%d", host, port)
    return runner
