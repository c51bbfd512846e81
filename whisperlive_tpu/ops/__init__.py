"""TPU compute primitives (jnp + Pallas)."""

from whisperlive_tpu.ops.mel import (  # noqa: F401
    LogMelConfig,
    log_mel_spectrogram,
    mel_filter_bank,
)
