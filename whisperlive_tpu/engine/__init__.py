"""The TPU inference engine: tokenizer, jitted programs, batch scheduler."""

from whisperlive_tpu.engine.tokenizer import (  # noqa: F401
    LANGUAGES,
    TokenSpec,
    WhisperTokenizer,
)
