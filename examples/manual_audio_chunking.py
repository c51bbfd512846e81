#!/usr/bin/env python
"""Push-mode streaming with manual chunking (the reference's
examples/manual_audio_chunking.py workflow): you own the audio source and
push PCM chunks; callbacks deliver partial and committed segments."""

import sys
import time

import numpy as np

from whisperlive_tpu.audio.io import load_audio
from whisperlive_tpu.client import StreamingTranscriptionClient


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "audio.wav"
    audio = load_audio(path)  # float32 mono 16 kHz

    client = StreamingTranscriptionClient(
        "localhost",
        9090,
        lang="en",
        on_partial=lambda seg: print(f"~ {seg['text']}", flush=True),
        on_committed=lambda seg: print(
            f"[{seg['start']} -> {seg['end']}] {seg['text']}", flush=True
        ),
        on_error=lambda e: print(f"error: {e}", file=sys.stderr),
    )

    chunk = 4096  # samples (~0.25 s)
    for off in range(0, len(audio), chunk):
        client.send_array(audio[off : off + chunk])
        time.sleep(chunk / 16000)  # real-time pacing
    client.close()  # sends END_OF_AUDIO and waits for the final segments


if __name__ == "__main__":
    main()
