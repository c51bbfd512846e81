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


def measure_effective_peaks(
    depth: int = 2,
    iters: int = 6,
    seconds_budget: float = 90.0,
    n: int = 4096,
    chain: int = 8,
    kv_shape: tuple[int, int, int, int] = (16, 20, 2048, 64),
    inner: int = 16,
    self_shape: tuple[int, int, int, int] | None = None,
) -> dict:
    """Measure THIS device's effective envelopes UNDER DISPATCH OVERLAP —
    the denominators utilization numbers must be bounded by when the
    serving path pipelines dispatches (bench.py runs depth-2; a
    single-program calibration undercounts the envelope and utilizations
    read > 1, VERDICT r4 item 5). Probes:

      * tflops — bf16 matmul chains (MXU envelope)
      * int8_gbps / int8_geps — the decode step's ACTUAL dominant int8
        read: the Pallas cross-attention kernel (ops/attention.py)
        streaming a large int8 KV HBM->VMEM, looped `inner` times per
        dispatch so device time dominates the dispatch round trip
      * bf16_gbps / bf16_geps — the step's bf16 self-KV read pattern:
        single-query attention over a large bf16 KV (XLA path), at
        `self_shape` (defaults to kv_shape)

    The stream probes run the step's own op shapes rather than abstract
    copies/reductions: a `jnp.sum` reduction measures the VPU reduction
    pipeline, not the DMA stream (measured 4.5 GB/s vs ~100 GB/s real —
    the round-5 first-cut mistake), and abstract copies overstate what an
    attention read can achieve. SHAPES MATTER AS MUCH AS OP PATTERNS:
    the int8 kernel at T=2048 (5.2 MB/cell, bandwidth-bound) measures
    ~52 GB/s on the relay, but at the continuous path's actual T=640
    (1.6 MB/cell) the pipelined per-cell DMA is LATENCY-bound and runs
    ~160 GB/s effective (scripts/smoke_blockdma.py) — callers must pass
    the kv_shape their step actually streams or the roof is ~3x too low
    and sol fractions read as fake near-1 "floors". Each probe keeps
    `depth` dispatches in flight and syncs via a scalar device->host
    fetch (block_until_ready does not sync through the axon relay).
    Returns {} on probe failure (callers fall back to effective_peaks)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    t_start = time.monotonic()

    def overlapped(fn, args, work_per_call: float) -> float:
        """Rate of `work_per_call` units/s with `depth` in-flight calls."""
        pending = []
        # warmup / compile
        np.asarray(fn(*args))
        t0 = time.monotonic()
        for _ in range(iters):
            pending.append(fn(*args))
            if len(pending) >= depth:
                np.asarray(pending.pop(0))
        for p in pending:
            np.asarray(p)
        return iters * work_per_call / (time.monotonic() - t0)

    out: dict = {}
    try:
        x = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def mm(a):
            for _ in range(chain):
                a = a @ a
            return a.sum(dtype=jnp.float32)

        out["tflops"] = overlapped(mm, (x,), chain * 2 * n**3) / 1e12
        if time.monotonic() - t_start > seconds_budget:
            return out

        from whisperlive_tpu.ops import attention as attn_ops

        b, h, t, hd = kv_shape
        interp = jax.default_backend() not in ("tpu", "axon")
        kv_bytes = 2.0 * b * h * t * hd  # K + V, once per inner iteration

        # big trees ride as jit ARGUMENTS (a closure would embed them in
        # the compile payload — multi-GB relay requests fail, CLAUDE.md)
        kvp = jnp.ones((b, h, t, 2 * hd), jnp.int8)  # packed K|V lanes
        q1 = jnp.ones((b, h, hd), jnp.bfloat16)

        @jax.jit
        def stream8(q, kv):
            def body(_, qq):
                o = attn_ops.cross_attention_int8(qq, kv, interpret=interp)
                return (qq + o.astype(qq.dtype) * 1e-6).astype(qq.dtype)

            return jax.lax.fori_loop(0, inner, body, q).sum(
                dtype=jnp.float32
            )

        out["int8_gbps"] = (
            overlapped(stream8, (q1, kvp), inner * kv_bytes) / 1e9
        )
        out["int8_geps"] = out["int8_gbps"]
        if time.monotonic() - t_start > seconds_budget:
            return out

        b, h, t, hd = self_shape or kv_shape
        kv_bytes = 2.0 * b * h * t * hd
        q1 = jnp.ones((b, h, hd), jnp.bfloat16)
        k16 = jnp.ones((b, h, t, hd), jnp.bfloat16)
        v16 = jnp.ones((b, h, t, hd), jnp.bfloat16)

        @jax.jit
        def stream16(q, k, v):
            def body(_, qq):
                s = jnp.einsum("bhd,bhtd->bht", qq, k) * (hd ** -0.5)
                p = jax.nn.softmax(s, axis=-1).astype(k.dtype)
                o = jnp.einsum("bht,bhtd->bhd", p, v)
                return (qq + o * 1e-6).astype(qq.dtype)

            return jax.lax.fori_loop(0, inner, body, q).sum(
                dtype=jnp.float32
            )

        out["bf16_gbps"] = (
            overlapped(stream16, (q1, k16, v16), inner * kv_bytes * 2.0)
            / 1e9
        )
        out["bf16_geps"] = out["bf16_gbps"] / 2.0
        if time.monotonic() - t_start > seconds_budget:
            return out

        # int8-weight dequant matmul (ops/quant_matmul.py) at the decode
        # step's small-M shape — the WEIGHT stream rides this kernel, not
        # the attention kernel, and its effective rate differs (different
        # block pipeline and per-tile dequant)
        from whisperlive_tpu.ops import quant_matmul as qmm

        m, kdim, ndim = 16, 1280, 5120
        w8 = jnp.ones((kdim, ndim), jnp.int8)
        sc = jnp.ones((ndim,), jnp.float32)
        xm = jnp.ones((m, kdim), jnp.bfloat16)

        @jax.jit
        def wmm(x, w, s):
            def body(_, xx):
                o = qmm.int8_matmul(xx, w, s, interpret=interp)
                return (xx + o[:, :kdim] * 1e-6).astype(xx.dtype)

            return jax.lax.fori_loop(0, inner, body, x).sum(
                dtype=jnp.float32
            )

        out["int8_mm_gbps"] = (
            overlapped(wmm, (xm, w8, sc), inner * float(kdim * ndim)) / 1e9
        )
    except Exception:  # pragma: no cover - device-dependent
        import logging

        logging.getLogger(__name__).exception("effective-peak probe failed")
    return out


def step_time_roof(step: "StepCost", peaks: dict) -> float:
    """Lower-bound seconds for ONE lockstep decode step on the MEASURED
    envelopes: max(MXU time, HBM stream time), charging int8 and bf16
    traffic at their separately measured rates (conservative: assumes the
    two streams do not overlap each other). The achieved/roof fraction
    this yields is bounded by 1 whenever the probe measured a true
    envelope — the honest 'how close to speed-of-light is the step'
    number (VERDICT r4 items 2 and 5)."""
    if not peaks or not all(
        k in peaks for k in ("tflops", "int8_gbps", "bf16_gbps")
    ):
        tf, bw = effective_peaks()
        return max(step.flops / tf, step.bytes / bw)
    t_mxu = step.flops / (peaks["tflops"] * 1e12)
    # weights ride the dequant-matmul kernel; charge them at its own
    # measured rate when probed (they are int8 whenever weight_bits=8,
    # i.e. part of int8_bytes — split them out of the attention stream)
    kv_int8 = step.int8_bytes
    t_w = 0.0
    if "int8_mm_gbps" in peaks and step.weight_stream_int8:
        kv_int8 = step.int8_bytes - step.weight_bytes
        t_w = step.weight_bytes / (peaks["int8_mm_gbps"] * 1e9)
    t_hbm = (
        t_w
        + kv_int8 / (peaks["int8_gbps"] * 1e9)
        + step.bf16_bytes / (peaks["bf16_gbps"] * 1e9)
    )
    return max(t_mxu, t_hbm)


@dataclass(frozen=True)
class StepCost:
    """Per-decode-step cost at a given batch (lockstep: one step advances
    every item one token)."""

    flops: float  # total FLOPs per step across the batch
    weight_bytes: float  # batch-shared weight reads (int8 decoder + embed)
    kv_bytes: float  # per-item KV reads (int8 cross + bf16 self), summed
    elements: float  # total HBM elements touched (the relay is
    # element-rate-bound, BENCH_NOTES r1 — bytes alone mislead here)
    int8_bytes: float = 0.0  # dtype split of the traffic, for roofs that
    bf16_bytes: float = 0.0  # charge each stream at its measured rate
    weight_stream_int8: bool = True  # weight_bytes included in int8_bytes
    # (int8 decoder weights, the serving default) vs in bf16_bytes

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

    int8_bytes = 0.0
    bf16_bytes = batch * self_elems * 2.0
    if weight_bits == 8:
        int8_bytes += float(weight_bytes)
    else:
        bf16_bytes += float(weight_bytes)
    if cross_kv_bits in (4, 8):
        int8_bytes += batch * cross_elems * cross_kv_bits / 8.0
    else:
        bf16_bytes += batch * cross_elems * 2.0

    return StepCost(
        flops=flops,
        weight_bytes=float(weight_bytes),
        kv_bytes=float(kv_bytes),
        elements=float(weight_elems + kv_elems),
        int8_bytes=float(int8_bytes),
        bf16_bytes=float(bf16_bytes),
        weight_stream_int8=(weight_bits == 8),
    )


def continuous_step_cost(
    cfg: Any,
    n_rows: int,
    cache_len: int,
    cross_positions: float,
    cross_kv_bits: int = 8,
    weight_bits: int = 8,
) -> StepCost:
    """Cost of one lockstep CONTINUOUS decode step under the length-aware
    active-skip kernels (ops/attention.py block DMA): cross-KV streams
    only `cross_positions` total block-padded encoder positions (summed
    over the occupied lane rows — ContinuousEngine tick_stats
    step_cross_pos per tick), while weights and self-KV stream for the
    full `n_rows` pool (XLA batch ops, no skip). Using the full-pool
    cross model here would overstate mandatory traffic and push
    tick_sol_frac past 1 the moment the kernel skips its first block."""
    d = cfg.n_text_state
    L = cfg.n_text_layer
    V = cfg.n_vocab

    per_item = L * (24 * d * d + 4 * cache_len * d)
    per_item += 2 * d * V
    # cross_positions is already summed over active rows
    flops = n_rows * float(per_item) + L * 4 * cross_positions * d

    wbits = weight_bits / 8.0
    weight_bytes = (L * 12 * d * d + V * d) * wbits
    weight_elems = L * 12 * d * d + V * d

    cross_elems = L * 2 * cross_positions * d  # summed over active rows
    self_elems = n_rows * L * 2 * cache_len * d
    kv_bytes = cross_elems * cross_kv_bits / 8.0 + self_elems * 2.0

    int8_bytes = cross_elems * cross_kv_bits / 8.0 if cross_kv_bits in (4, 8) else 0.0
    bf16_bytes = self_elems * 2.0 + (0.0 if cross_kv_bits in (4, 8) else cross_elems * 2.0)
    if weight_bits == 8:
        int8_bytes += float(weight_bytes)
    else:
        bf16_bytes += float(weight_bytes)

    return StepCost(
        flops=float(flops),
        weight_bytes=float(weight_bytes),
        kv_bytes=float(kv_bytes),
        elements=float(weight_elems + cross_elems + self_elems),
        int8_bytes=float(int8_bytes),
        bf16_bytes=float(bf16_bytes),
        weight_stream_int8=(weight_bits == 8),
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
