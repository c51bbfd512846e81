"""whisperlive_tpu — a TPU-native real-time speech-to-text framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
collabora/WhisperLive: a streaming WebSocket transcription server (plus an
OpenAI-compatible REST endpoint) backed by a single continuously-batched
Whisper inference engine running on TPU.

Layering (wire → silicon):

    client/        drop-in Python client library (same wire protocol)
    serving/       asyncio WebSocket server, session state machine, REST
    engine/        the TPU engine: jitted encode/decode, batch scheduler,
                   tokenizer
    models/        functional JAX Whisper (and translation) model defs +
                   HF weight conversion
    ops/           TPU compute primitives: matmul-STFT log-mel, attention,
                   logit processors (Pallas kernels where they pay)
    parallel/      jax.sharding meshes and partition specs (TP/DP over ICI)
    audio/         host-side audio IO: WAV/PCM, resampling, streaming VAD
    utils/         metrics, SRT, logging

Unlike the reference (which binds three external C++/CUDA inference
runtimes), all model compute here is one JAX program per TPU slice with
fixed shapes, so dozens of concurrent streams share one compiled executable
with zero recompilation.
"""

__version__ = "0.1.0"
