"""Functional JAX model definitions + HF weight conversion."""

from whisperlive_tpu.models.whisper import (  # noqa: F401
    WhisperConfig,
    WHISPER_CONFIGS,
    init_params,
    encode,
    decode_prefill,
    decode_step,
    compute_cross_kv,
    init_self_kv,
)
