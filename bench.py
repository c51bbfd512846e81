#!/usr/bin/env python
"""Headline benchmark: streaming transcription throughput on one TPU chip.

Measures the full engine path — on-device log-mel -> encoder -> cross-KV ->
prompt prefill -> N-token autoregressive decode — at a production batch
size, and reports the real-time factor: seconds of audio transcribed per
wall-clock second (RTFx). The reference keeps RTF < 1 per stream by
construction (BASELINE.md "implicit real-time factor"), so RTFx is also
the upper bound on concurrent real-time streams one chip sustains.

Prints ONE JSON line:
  {"metric": "rtfx_streaming", "value": N, "unit": "audio_s_per_s",
   "vs_baseline": N}
vs_baseline is vs RTF=1.0 (the reference's per-stream real-time contract —
it publishes no absolute throughput numbers, BASELINE.md).

Weights are random (no egress in this environment): throughput is
weight-value-independent. Decode length is fixed at DECODE_TOKENS per 30 s
window — matching dense speech (~4 tokens/s), since random weights never
emit EOT early.
"""

import json
import os
import sys
import time

import numpy as np

MODEL = os.environ.get("WL_BENCH_MODEL", "large-v3")
CROSS_BITS = int(os.environ.get("WL_CROSS_BITS", "8"))
# B=16 overtook B=8 once the packed K|V cross-KV layout halved the
# step's DMA stream count (round 5: 212 vs 190 RTFx, repeatable; B=32
# exhausts the relay chip's HBM) — see BENCH_NOTES.md round-5 sweep.
BATCH = int(os.environ.get("WL_BENCH_BATCH", "16"))
DECODE_TOKENS = int(os.environ.get("WL_BENCH_TOKENS", "120"))
ITERS = int(os.environ.get("WL_BENCH_ITERS", "4"))
WINDOW_S = 30.0


def _wait_for_device(max_wait_s: float = 900.0) -> None:
    """The axon relay flaps (observed multi-hour outages with brief
    recoveries): a trivial jit can hang forever instead of erroring. Probe
    it with a hard thread-timeout and retry for up to max_wait_s before
    starting the expensive run, so a transient flap doesn't eat the
    round's bench artifact."""
    import threading

    result: list = []

    def probe() -> None:
        try:
            import jax
            import jax.numpy as jnp

            np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256))))
            result.append(True)
        except Exception as e:  # pragma: no cover - relay-dependent
            result.append(e)

    # Exactly ONE probe outstanding at a time: a wedged device call can't
    # be cancelled, but it completes the moment the relay recovers — and a
    # pile of stacked probes would serialize behind each other on the
    # single relay connection and mask that recovery.
    deadline = time.monotonic() + max_wait_s
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    last_msg = time.monotonic()
    while time.monotonic() < deadline:
        t.join(timeout=5.0)
        if result:
            if result[-1] is True:
                return
            print(f"device probe error: {result[-1]}; retrying in 30s",
                  file=sys.stderr)
            result.clear()
            time.sleep(30.0)
            t = threading.Thread(target=probe, daemon=True)
            t.start()
        if time.monotonic() - last_msg > 60.0:
            print("waiting for device...", file=sys.stderr)
            last_msg = time.monotonic()
    print(f"device probe still pending after {max_wait_s:.0f}s — "
          "proceeding; if the relay is hard-down the run will hang or "
          "fail rather than report a number", file=sys.stderr)


def main() -> None:
    import jax

    _wait_for_device()

    cache = os.path.expanduser("~/.cache/whisper-live-tpu/xla-cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass

    from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params
    from whisperlive_tpu.ops.mel import N_SAMPLES

    import jax.numpy as jnp

    cfg = WHISPER_CONFIGS[MODEL]
    # bf16 init directly on device: a large-v3 f32 copy alone is ~6 GB HBM
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    engine = WhisperEngine(cfg, params, batch_buckets=(BATCH,),
                           cross_kv_bits=CROSS_BITS)
    options = TranscribeOptions(
        language="en",
        temperatures=(0.0,),  # fallback cascade disabled: fixed work per iter
        log_prob_threshold=None,
        compression_ratio_threshold=None,
        max_new_tokens=DECODE_TOKENS,
    )

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((BATCH, N_SAMPLES)) * 0.1).astype(np.float32)
    prompts, sots = [], []
    for _ in range(BATCH):
        p, s = engine.build_prompt(options)
        prompts.append(p)
        sots.append(s)
    known = [True] * BATCH

    # warmup / compile (the fused single-dispatch serving program)
    engine.transcribe_batch(audio, prompts, sots, known, options, seed=0)

    def timed_run(opts, iters):
        # depth-2 pipeline (transcribe_batch_async): batch i+1's audio
        # upload + program dispatch overlaps batch i's device compute —
        # the production bulk path (BatchedTranscriber) runs the same way
        t0 = time.monotonic()
        tokens = 0
        pending = []

        def drain(p):
            nonlocal tokens
            results, _, _ = p.resolve()
            tokens += sum(len(r.tokens) for r in results)

        for i in range(iters):
            pending.append(engine.transcribe_batch_async(
                audio, prompts, sots, known, opts, seed=i
            ))
            if len(pending) > 1:
                drain(pending.pop(0))
        for p in pending:
            drain(p)
        return time.monotonic() - t0, tokens

    wall, total_tokens = timed_run(options, ITERS)
    total_audio = ITERS * BATCH * WINDOW_S
    rtfx = total_audio / wall

    # Fixed-vs-marginal split (VERDICT r3 item 4): a second run at a short
    # decode length shares the SAME compiled program (max_new is a traced
    # operand; 12 and 120 land in the same KV bucket), so the wall delta
    # isolates the marginal per-step cost from the per-dispatch fixed cost
    # (mel+encode+cross-KV+prefill+relay round trips).
    SHORT_TOKENS = int(os.environ.get("WL_BENCH_SHORT_TOKENS", "12"))
    import dataclasses

    short_opts = dataclasses.replace(options, max_new_tokens=SHORT_TOKENS)
    wall_short, tokens_short = timed_run(short_opts, ITERS)

    steps_long = total_tokens / BATCH / ITERS  # lockstep: steps ≈ max item
    steps_short = tokens_short / BATCH / ITERS
    marginal_s = max(
        ((wall - wall_short) / ITERS) / max(steps_long - steps_short, 1.0), 1e-9
    )
    fixed_s = max(wall / ITERS - steps_long * marginal_s, 0.0)

    # Roofline model (utils/roofline.py): modeled FLOPs + HBM traffic vs
    # device peaks, to show where the remaining headroom is.
    from whisperlive_tpu.utils import roofline

    prompt_pad = 16  # "en" prompt (3 tokens) → smallest prompt bucket
    cache_len = prompt_pad + engine.gen_buckets[0]  # 120 toks → 128 bucket
    step = roofline.decode_step_cost(
        cfg, BATCH, cache_len, cross_kv_bits=CROSS_BITS
    )
    flops_window = roofline.window_flops(
        cfg, BATCH, prompt_pad, cache_len, steps_long, cross_kv_bits=CROSS_BITS
    )
    achieved_flops = flops_window * ITERS / wall
    peak_flops, peak_hbm = roofline.nominal_peaks(
        getattr(jax.devices()[0], "device_kind", str(jax.devices()[0]))
    )
    # Effective envelopes MEASURED under the same depth-2 dispatch overlap
    # this bench runs (a single-program calibration undercounts them and
    # utilizations read > 1 — round-4 bench artifact). Probe failure falls
    # back to the env-overridable static estimates.
    peaks = {}
    if os.environ.get("WL_MEASURE_PEAKS", "1") != "0":
        peaks = roofline.measure_effective_peaks()
    eff_flops, _ = roofline.effective_peaks()
    if peaks:
        eff_flops = peaks["tflops"] * 1e12
    step_hbm = step.bytes / marginal_s
    step_elem_rate = step.elements / marginal_s
    # NOTE on per-step roofs here: the window-path decode program streams
    # weights (Pallas dequant matmuls), cross-KV (Pallas attention) and
    # self-KV (XLA) through CONCURRENT DMA pipelines — measured aggregate
    # ~1.9 GB / ~10 ms/step, ABOVE any single-kernel stream envelope the
    # probe can measure (chip-measured round 5: probe int8 ~53 GB/s,
    # bf16 ~103 GB/s; achieved step ~180-220 GB/s mixed). A sequential-
    # stream roof is therefore not a valid lower bound for this program;
    # the bounded honest numbers are mfu_effective (vs the measured MXU
    # envelope) and hbm_util (vs nominal silicon). The continuous-tick
    # roof in scripts/bench_streaming.py IS validated (0.82-0.89
    # achieved-vs-roof) — per-slot attention reads dominate there.

    result = {
        "metric": "rtfx_streaming",
        "value": round(rtfx, 2),
        "unit": "audio_s_per_s",
        "vs_baseline": round(rtfx / 1.0, 2),
        "detail": {
            "model": MODEL,
            "batch": BATCH,
            "decode_tokens_per_window": DECODE_TOKENS,
            "tokens_per_s": round(total_tokens / wall, 1),
            "wall_s": round(wall, 2),
            "cross_kv_bits": CROSS_BITS,
            "device": str(jax.devices()[0]),
            # --- roofline accounting (BENCH_NOTES has the narrative) ---
            "fixed_ms": round(fixed_s * 1e3, 1),  # per window-batch dispatch
            "step_ms": round(marginal_s * 1e3, 2),  # marginal per decode step
            "modeled_gflops_per_window": round(flops_window / 1e9, 1),
            "achieved_tflops": round(achieved_flops / 1e12, 2),
            "mfu": round(achieved_flops / peak_flops, 4),  # vs nominal silicon
            # vs the MEASURED overlapped envelope (bounded by 1 when the
            # probe ran; the probe results print below so the denominator
            # is inspectable)
            "mfu_effective": round(achieved_flops / eff_flops, 4),
            "step_hbm_bytes": int(step.bytes),
            "step_hbm_gbps": round(step_hbm / 1e9, 1),
            "hbm_util": round(step_hbm / peak_hbm, 4),  # vs nominal silicon
            "step_gelems_per_s": round(step_elem_rate / 1e9, 1),
            "measured_peaks": {
                k: round(v, 1) for k, v in peaks.items()
            } or None,
        },
    }
    print(json.dumps(result))


def _is_oom(e: BaseException) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "out of memory" in s.lower()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # The default B=16 headline leaves limited HBM headroom on the
        # relay chip (B=32 hard-OOMs). If a fragmentation-unlucky run
        # exhausts HBM, re-exec at B=8 in a FRESH process (the relay only
        # reliably frees device buffers on client exit) rather than lose
        # the round's bench artifact. Explicit WL_BENCH_BATCH is honored
        # as-is — no silent substitution under an operator override.
        if _is_oom(e) and "WL_BENCH_BATCH" not in os.environ and BATCH > 8:
            print(f"OOM at B={BATCH}; re-exec at B=8: {e}", file=sys.stderr)
            os.environ["WL_BENCH_BATCH"] = "8"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
