"""Log-mel spectrogram frontend, designed for the TPU MXU.

Replaces the reference's torch STFT feature extractor (behavioral contract
documented at /root/reference SURVEY §2.9a; reference implementation shape:
whisper_live/transcriber/transcriber_tensorrt.py:311-367): 16 kHz audio,
N_FFT=400, HOP=160, 80 or 128 mel bins, 30 s window = 3000 frames,
``log10(clamp(mel @ |STFT|^2)) -> max(x, x.max()-8) -> (x+4)/4``.

TPU-first design: instead of an FFT (which XLA lowers poorly for small
batched transforms), the STFT is expressed as two dense matmuls against
precomputed real/imaginary DFT basis matrices:

    frames[B, T, 400] @ dft_cos[400, 201] -> re
    frames[B, T, 400] @ dft_sin[400, 201] -> im
    (re^2 + im^2)     @ mel_fb[201, n_mels] -> mel power

Every FLOP lands on the 128x128 systolic array; XLA fuses the window
multiply, the magnitude square and the log/normalize elementwise chain into
the matmul epilogues. For a 30 s window this is ~0.5 GFLOP — negligible next
to the encoder — so features are computed on-device, avoiding a host
round-trip per chunk entirely.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hertz_to_mel(freq):
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )
    return mels


def _mel_to_hertz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


def mel_filter_bank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = 80,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_freqs, n_mels].

    Matches librosa.filters.mel(htk=False, norm="slaney"), which is the
    filterbank the Whisper family was trained with (the reference ships it as
    a baked .npz; we construct it from the closed form instead).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_min = _hertz_to_mel(fmin)
    mel_max = _hertz_to_mel(fmax)
    mel_points = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_points = _mel_to_hertz(mel_points)

    # Triangular filters via slopes between adjacent center frequencies.
    fdiff = np.diff(hz_points)
    slopes = hz_points[np.newaxis, :] - fft_freqs[:, np.newaxis]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # Slaney normalization: each filter integrates to ~2/bandwidth.
    enorm = 2.0 / (hz_points[2 : n_mels + 2] - hz_points[:n_mels])
    fb *= enorm[np.newaxis, :]
    return fb.astype(np.float32)  # [n_freqs, n_mels]


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    n_mels: int = 80
    n_fft: int = N_FFT
    hop_length: int = HOP_LENGTH
    sample_rate: int = SAMPLE_RATE


@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT basis for onesided rFFT as [n_fft, n_fft//2+1] matmuls."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_freqs)[np.newaxis, :]
    n = np.arange(n_fft)[:, np.newaxis]
    angle = -2.0 * np.pi * n * k / n_fft
    return np.cos(angle).astype(np.float32), np.sin(angle).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _windowed_basis(n_fft: int, n_mels: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hann-window-folded DFT basis + mel filterbank as numpy constants.

    Folding the Hann window into the DFT matrices removes one elementwise
    multiply from the device program.
    """
    cos_b, sin_b = _dft_basis(n_fft)
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic Hann
    return window[:, None] * cos_b, window[:, None] * sin_b, mel_filter_bank(n_mels=n_mels)


def _frame(audio: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[B, T_samples] -> [B, n_frames, n_fft] centered frames (reflect pad).

    Uses conv_general_dilated_patches so XLA emits a strided gather it knows
    how to lay out for the MXU-bound matmul that follows.
    """
    pad = n_fft // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    patches = jax.lax.conv_general_dilated_patches(
        audio[:, None, :],  # [B, C=1, T]
        filter_shape=(n_fft,),
        window_strides=(hop,),
        padding="VALID",
    )  # [B, n_fft, n_frames]
    return jnp.swapaxes(patches, 1, 2)


def log_mel_spectrogram(
    audio: jax.Array,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
) -> jax.Array:
    """Whisper log-mel features, feature-last layout.

    Args:
        audio: [B, n_samples] float32 PCM at 16 kHz. For a standard 30 s
            window pass exactly N_SAMPLES=480000 samples (pre-padded by the
            caller so shapes stay static under jit).
        n_mels: 80 (whisper <= large-v2) or 128 (large-v3).

    Returns:
        [B, n_samples // hop_length, n_mels] float32 — e.g. [B, 3000, 80].
        (Reference layout is [B, n_mels, 3000]; we keep features last so the
        encoder conv stem reads it without a device transpose.)
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    cos_b, sin_b, mel_fb = _windowed_basis(n_fft, n_mels)
    cos_b, sin_b, mel_fb = jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_fb)

    frames = _frame(audio.astype(jnp.float32), n_fft, hop_length)
    # Whisper drops the final STFT frame (stft returns T//hop + 1 frames).
    frames = frames[:, :-1, :]
    # HIGHEST precision: TPU f32 matmuls otherwise round through bf16 on the
    # MXU, which audibly distorts the log-mel dynamic-range clamp. These are
    # ~0.5 GFLOP/window — precision here is free.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nf->btf", frames, cos_b, precision=hi,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nf->btf", frames, sin_b, precision=hi,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im  # [B, T, n_freqs]
    mel = jnp.einsum("btf,fm->btm", power, mel_fb, precision=hi,
                     preferred_element_type=jnp.float32)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Dynamic-range clamp is per-item over the whole window (matches whisper).
    max_per_item = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_item - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side pad/trim to a fixed sample count (keeps jit shapes static)."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = length - audio.shape[-1]
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])


def pad_or_trim_frames(mel: np.ndarray, length: int = N_FRAMES) -> np.ndarray:
    """Zero-pad/trim a [T, n_mels] feature slice to a fixed frame count —
    the mel-domain pad_or_trim the reference applies to each seek window
    (transcriber_faster_whisper.py:1127)."""
    if mel.shape[0] >= length:
        return mel[:length]
    return np.pad(mel, [(0, length - mel.shape[0]), (0, 0)])


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _raw_log_mel_chunk(sig: jax.Array, n_mels: int) -> jax.Array:
    """[1, (C-1)*hop + n_fft] pre-padded samples -> [C, n_mels] raw log10
    mel (no dynamic-range clamp — that is global, applied by the caller)."""
    cos_b, sin_b, mel_fb = _windowed_basis(N_FFT, n_mels)
    patches = jax.lax.conv_general_dilated_patches(
        sig[:, None, :], filter_shape=(N_FFT,), window_strides=(HOP_LENGTH,),
        padding="VALID",
    )  # [1, n_fft, C]
    frames = jnp.swapaxes(patches, 1, 2)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nf->btf", frames, jnp.asarray(cos_b), precision=hi,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nf->btf", frames, jnp.asarray(sin_b), precision=hi,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.einsum("btf,fm->btm", power, jnp.asarray(mel_fb), precision=hi,
                     preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(mel, 1e-10))[0]


def log_mel_full(
    audio: np.ndarray, n_mels: int = 80, padding: int = HOP_LENGTH
) -> np.ndarray:
    """Whole-clip log-mel features for the offline seek loop.

    faster_whisper FeatureExtractor semantics (the contract the reference
    binds, SURVEY §2.9a): `padding` zero samples appended, centered STFT
    with reflect edges, final frame dropped, and — critically — the max-8
    dynamic-range clamp taken over the WHOLE clip, not per window. The seek
    loop then slices [seek : seek+3000] frames from this array.

    Device compute stays fixed-shape: raw log-mel runs in 3000-frame chunks
    through one compiled program; only the global clamp/scale runs on host.

    Returns [T, n_mels] float32 with T = (len(audio)+padding) // HOP_LENGTH.
    """
    audio = np.asarray(audio, np.float32).reshape(-1)
    n_frames = (len(audio) + padding) // HOP_LENGTH
    if n_frames <= 0:
        return np.zeros((0, n_mels), np.float32)
    half = N_FFT // 2
    sig = np.pad(audio, (0, padding))
    if len(sig) > half:
        sig = np.pad(sig, (half, half), mode="reflect")
    else:
        sig = np.pad(sig, (half, half))

    chunk_frames = N_FRAMES
    chunk_samples = (chunk_frames - 1) * HOP_LENGTH + N_FFT
    pieces = []
    for f0 in range(0, n_frames, chunk_frames):
        buf = np.zeros(chunk_samples, np.float32)
        src = sig[f0 * HOP_LENGTH : f0 * HOP_LENGTH + chunk_samples]
        buf[: len(src)] = src
        pieces.append(np.asarray(_raw_log_mel_chunk(jnp.asarray(buf[None]), n_mels)))
    log_spec = np.concatenate(pieces, axis=0)[:n_frames]
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
