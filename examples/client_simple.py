#!/usr/bin/env python
"""Minimal callback-style client (equivalent of the reference's
client_oldapi.py): connect, stream a file, print updates as they arrive."""

import sys

from whisperlive_tpu.client import TranscriptionClient


def on_transcription(text_lines, segments):
    """Called with the deduped rolling text and the raw segment dicts."""
    for seg in segments:
        marker = "✓" if seg.get("completed") else "~"
        print(f"{marker} [{seg['start']} → {seg['end']}]{seg['text']}")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "audio.wav"
    client = TranscriptionClient(
        "localhost",
        9090,
        lang="en",
        model="small",
        transcription_callback=on_transcription,
    )
    final_text = client(path)
    print("\nfinal transcript:\n", final_text)


if __name__ == "__main__":
    main()
