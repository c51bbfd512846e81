#!/usr/bin/env python
"""Use the OpenAI Python SDK against the server's REST endpoint.

Equivalent of the reference's client_openai.py: start the server with
--enable_rest and point the official SDK at it.

    python run_server.py --port 9090 --enable_rest --rest_port 9091 -tpu <ckpt>
    python examples/client_openai.py audio.wav
"""

import sys

try:
    from openai import OpenAI
except ImportError:
    raise SystemExit("pip install openai")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "audio.wav"
    client = OpenAI(base_url="http://localhost:9091/v1", api_key="unused")
    with open(path, "rb") as f:
        result = client.audio.transcriptions.create(
            model="whisper-1",
            file=f,
            response_format="verbose_json",
        )
    print(result.text)
    for seg in getattr(result, "segments", []) or []:
        print(f"[{seg['start']:.2f} -> {seg['end']:.2f}]{seg['text']}")


if __name__ == "__main__":
    main()
