"""Python client library (drop-in compatible with whisper_live.client)."""

from whisperlive_tpu.client.client import (  # noqa: F401
    Client,
    StreamingTranscriptionClient,
    TranscriptionClient,
    TranscriptionTeeClient,
)
