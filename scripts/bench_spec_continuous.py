"""Speculative CONTINUOUS batching cost probe, measured on the real chip.

Random weights make end-to-end streaming speedup unmeasurable honestly
(a random draft never agrees), but the verify-round economics are
weight-independent. This bench runs the actual serving programs — the
plain lockstep chunk and the speculative verify-round chunk — over a
full slot pool and reports:

  step_cost      plain chunk / steps_per_chunk      (1 token/slot each)
  round_cost     spec chunk / rounds_per_chunk      (1+a tokens/slot)
  breakeven a*   acceptance where spec == plain:  a* = (R/S - 1) / k
  speedup(a)     (1 + a*k) / (round_cost / step_cost)

All timings are honest fetch-forced (the packed status fetch inside
step() already forces a device->host transfer; the axon relay ignores
block_until_ready). Slots are kept saturated with max_new large enough
that nothing finishes during timing.

Usage: python scripts/bench_spec_continuous.py [--model large-v3]
       [--draft_layers 2] [--k 4] [--slots 8] [--chunks 6]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--draft_layers", type=int, default=2,
                    help="Decoder layers for the distil-shaped draft "
                         "(distil-large-v3 has 2).")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--steps_per_chunk", type=int, default=8)
    args = ap.parse_args()

    from whisperlive_tpu.engine.continuous import ContinuousEngine
    from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params
    from whisperlive_tpu.ops import mel as mel_ops

    cfg = WHISPER_CONFIGS[args.model]
    print(f"building {args.model} target + {args.draft_layers}-layer draft "
          f"(random weights; costs are weight-independent)", flush=True)
    eng = WhisperEngine(cfg, init_params(cfg, 0))
    dcfg = cfg.replace(n_text_layer=args.draft_layers)
    draft = WhisperEngine(dcfg, init_params(dcfg, 7))

    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
    )
    p, s = eng.build_prompt(opts, language="en")
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(
        (args.slots, mel_ops.N_SAMPLES)) * 0.05).astype(np.float32)

    def saturate(cb):
        """Fill every slot; max_new = ring budget so nothing finishes."""
        cb.init_state()
        n = cb.n_slots
        cb.insert(audio[:n], [p] * n, [s] * n, [True] * n, list(range(n)),
                  [0.0] * n, [True] * n, [1.0] * n, [cb.ring - 1] * n)

    def time_chunks(cb, label, chunks):
        saturate(cb)
        cb.step()  # compile + warm
        saturate(cb)  # fresh budgets for the timed run
        cb.step()
        t0 = time.monotonic()
        for _ in range(chunks):
            status = cb.step()  # fetch-forced via the status array
        dt = (time.monotonic() - t0) / chunks
        assert status[:, 1].max() < 0.5, (
            f"{label}: a slot finished mid-timing — raise ring or lower "
            f"--chunks for an honest saturated measurement")
        return dt

    results = {}

    plain = ContinuousEngine(eng, n_slots=args.slots, prompt_pad=64,
                             ring=132, steps_per_chunk=args.steps_per_chunk)
    t_plain = time_chunks(plain, "plain", args.chunks)
    step_cost = t_plain / args.steps_per_chunk
    print(f"plain chunk {t_plain*1e3:.0f} ms -> step {step_cost*1e3:.1f} ms "
          f"({args.slots} slots)", flush=True)
    del plain

    # spec rounds consume k+2 ring entries each: with ring=132, k=4 the
    # per-window budget is ~20 rounds, so time in 2-round chunks to stay
    # saturated (2 warm + 2*chunks rounds must fit the budget)
    spec_spc = 2
    spec = ContinuousEngine(eng, n_slots=args.slots, prompt_pad=64,
                            ring=132, steps_per_chunk=spec_spc,
                            draft_engine=draft, spec_k=args.k)
    t_spec = time_chunks(spec, "spec", args.chunks)
    round_cost = t_spec / spec_spc
    print(f"spec chunk {t_spec*1e3:.0f} ms -> round {round_cost*1e3:.1f} ms "
          f"(k={args.k})", flush=True)

    ratio = round_cost / step_cost
    breakeven = max((ratio - 1.0) / args.k, 0.0)
    curve = {
        f"{a:.1f}": round((1 + a * args.k) / ratio, 2)
        for a in (0.0, 0.2, 0.4, 0.6, 0.8, 0.9, 1.0)
    }
    results.update(
        model=args.model, k=args.k, slots=args.slots,
        step_ms=round(step_cost * 1e3, 2),
        round_ms=round(round_cost * 1e3, 2),
        round_over_step=round(ratio, 3),
        breakeven_acceptance=round(breakeven, 3),
        speedup_vs_acceptance=curve,
    )
    print(json.dumps(results))
