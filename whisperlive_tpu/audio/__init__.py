"""Host-side audio: PCM/WAV IO, resampling, streaming VAD."""
