"""Roofline accounting for the Whisper serving path.

Closed-form FLOP and HBM-byte models of the engine's two phases — the
once-per-window insert (mel → encoder → cross-KV → prefill) and the
per-token decode step — so benchmarks can report achieved-vs-peak
utilisation (MFU, HBM util) and name the binding bottleneck with numbers
instead of vibes. The reference publishes no such accounting (BASELINE.md);
this is the TPU-native replacement for eyeballing `nvidia-smi`.

Conventions: FLOPs count multiply-adds as 2; attention is unmasked full
length (the engine decodes lockstep over static buckets, so padded work is
real work); weight bytes assume the serving defaults (int8 decoder linears
+ int8 tied embedding, models/whisper.py::quantize_decoder_weights; int8
cross-KV; bf16 self-KV and activations).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

# Nominal single-chip peaks by TPU device kind (bf16 matmul FLOP/s, HBM B/s).
# Sources: public TPU spec sheets. The axon relay used in this environment
# is heavily throttled relative to these — see `effective_peaks`.
DEVICE_PEAKS = {
    "v5 lite": (197e12, 819e9),  # v5e
    "v5litepod": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),  # v6e / Trillium
    "v6e": (918e12, 1640e9),
}
DEFAULT_PEAK = (197e12, 819e9)


def nominal_peaks(device_kind: str) -> tuple[float, float]:
    """(peak bf16 FLOP/s, peak HBM B/s) for a device-kind string."""
    kind = device_kind.lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return DEFAULT_PEAK


def effective_peaks() -> tuple[float, float]:
    """Measured-effective peaks of THIS environment's relayed chip
    (BENCH_NOTES: ~11 TFLOP/s in-program bf16, ~125 GB/s bf16 streaming).
    Override with WL_EFFECTIVE_TFLOPS / WL_EFFECTIVE_HBM_GBPS on other
    hardware."""
    tf = float(os.environ.get("WL_EFFECTIVE_TFLOPS", "11")) * 1e12
    bw = float(os.environ.get("WL_EFFECTIVE_HBM_GBPS", "125")) * 1e9
    return tf, bw


@dataclass(frozen=True)
class StepCost:
    """Per-decode-step cost at a given batch (lockstep: one step advances
    every item one token)."""

    flops: float  # total FLOPs per step across the batch
    weight_bytes: float  # batch-shared weight reads (int8 decoder + embed)
    kv_bytes: float  # per-item KV reads (int8 cross + bf16 self), summed
    elements: float  # total HBM elements touched (the relay is
    # element-rate-bound, BENCH_NOTES r1 — bytes alone mislead here)

    @property
    def bytes(self) -> float:
        return self.weight_bytes + self.kv_bytes


def decode_step_cost(
    cfg: Any,
    batch: int,
    cache_len: int,
    cross_ctx: int | None = None,
    cross_kv_bits: int = 8,
    weight_bits: int = 8,
) -> StepCost:
    """Cost of ONE lockstep decode step (engine.py::_decode body).

    cache_len: static self-KV slots (prompt_pad + gen bucket).
    cross_ctx: encoder positions resident in cross-KV (1500 full window,
    512 for reduced-context streaming tails).
    """
    T = cross_ctx or cfg.n_audio_ctx
    d = cfg.n_text_state
    L = cfg.n_text_layer
    V = cfg.n_vocab

    # matmul FLOPs per token per layer: q,k,v,o projections (4 × 2d²) +
    # MLP in/out at 4d width (2 × 2·4d²) = 24d²; attention reads:
    # QKᵀ + AV over self cache (4·cache_len·d) and cross ctx (4·T·d).
    per_item = L * (24 * d * d + 4 * cache_len * d + 4 * T * d)
    per_item += 2 * d * V  # logits matmul (tied embedding)
    flops = batch * float(per_item)

    wbits = weight_bits / 8.0
    weight_bytes = (L * 12 * d * d + V * d) * wbits
    weight_elems = L * 12 * d * d + V * d

    cross_elems = L * 2 * T * d
    self_elems = L * 2 * cache_len * d
    kv_bytes = batch * (cross_elems * cross_kv_bits / 8.0 + self_elems * 2.0)
    kv_elems = batch * (cross_elems + self_elems)

    return StepCost(
        flops=flops,
        weight_bytes=float(weight_bytes),
        kv_bytes=float(kv_bytes),
        elements=float(weight_elems + kv_elems),
    )


def window_insert_flops(
    cfg: Any,
    batch: int,
    prompt_pad: int,
    cross_ctx: int | None = None,
) -> float:
    """FLOPs of the once-per-window insert work: conv stem + encoder +
    cross-KV projection + prompt prefill (engine.py::_prepare + prefill).
    Mel extraction (matmul-STFT) is <1% of the encoder and is folded into
    the conv-stem term's margin."""
    T = cross_ctx or cfg.n_audio_ctx
    d = cfg.n_audio_state
    dt = cfg.n_text_state
    La, Lt = cfg.n_audio_layer, cfg.n_text_layer
    V = cfg.n_vocab

    conv = 2 * (2 * T) * 3 * cfg.n_mels * d + 2 * T * 3 * d * d
    enc_layer = 24 * T * d * d + 4 * T * T * d
    encoder = conv + La * enc_layer
    cross_proj = Lt * 2 * (2 * T * dt * dt)
    P = prompt_pad
    prefill = Lt * (24 * P * dt * dt + 4 * P * P * dt + 4 * P * T * dt)
    prefill += 2 * P * dt * V
    return batch * float(encoder + cross_proj + prefill)


def window_flops(
    cfg: Any,
    batch: int,
    prompt_pad: int,
    cache_len: int,
    new_tokens: int,
    cross_ctx: int | None = None,
    cross_kv_bits: int = 8,
) -> float:
    """Total modeled FLOPs for one window: insert + new_tokens decode steps."""
    step = decode_step_cost(
        cfg, batch, cache_len, cross_ctx=cross_ctx, cross_kv_bits=cross_kv_bits
    )
    return window_insert_flops(cfg, batch, prompt_pad, cross_ctx) + (
        step.flops * new_tokens
    )
