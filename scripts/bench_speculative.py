"""Speculative-decoding cost model, measured on the real chip.

Random weights make end-to-end speedup unmeasurable honestly (a random
draft never agrees with a random target), but every COST in the speedup
model is weight-independent, so this bench measures those and reports the
projected speedup curve vs acceptance rate:

  per-round cost    C(k)   = k * draft_step + verify_window(k+1)
  per-round emitted E(k,a) = 1 + a*k         (a = acceptance rate)
  speedup(a)               = E / (C / target_step)

Measured quantities (all honest fetch-forced timings — the axon relay
ignores block_until_ready):
  - target_step:    plain decode step, B=1 (the baseline token cost)
  - draft_step:     distil-draft decode step, B=1
  - verify_window:  decode_window over k+1 tokens, B=1
  - e2e exactness:  a full speculative decode runs on-chip and its token
    stream matches the plain greedy decode (the correctness bar at scale)

Usage:  python scripts/bench_speculative.py [--model large-v3]
        [--draft distil-large-v3] [--k 4] [--tokens 96]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _fetch(x) -> None:
    np.asarray(jax.tree.leaves(x)[0])


def _time(fn, iters: int = 8) -> float:
    fn()  # compile + warm
    _fetch(fn())
    t0 = time.monotonic()
    out = None
    for _ in range(iters):
        out = fn()
    _fetch(out)
    return (time.monotonic() - t0) / iters


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--draft", default="distil-large-v3")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
    from whisperlive_tpu.engine.speculative import SpeculativeDecoder
    from whisperlive_tpu.models import whisper as wmod
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params

    cfg_t = WHISPER_CONFIGS[args.model]
    cfg_d = WHISPER_CONFIGS[args.draft]
    print(f"building {args.model} target + {args.draft} draft (random weights)")
    target = WhisperEngine(cfg_t, init_params(cfg_t, 0), batch_buckets=(1, 2))
    draft = WhisperEngine(cfg_d, init_params(cfg_d, 7), batch_buckets=(1, 2))
    spec = SpeculativeDecoder(target, draft, k=args.k)

    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=args.tokens,
    )
    audio = (np.random.default_rng(0).standard_normal((1, 480000)) * 0.1
             ).astype(np.float32)
    enc, cross_t = target.prepare(audio)
    cross_d = spec.cross_from_enc(enc)

    prompt, sot = target.build_prompt(opts, language="en")
    prompt_arr, prompt_len = target._pad_prompts([prompt])
    prompt_pad = prompt_arr.shape[1]
    cache_len = prompt_pad + 128 + args.k + 1

    # ---- micro: per-step / per-window costs --------------------------------
    def step_cost(eng, cross):
        kv = wmod.init_self_kv(eng.cfg, 1, cache_len)
        tok = jnp.asarray([100], jnp.int32)
        pos = jnp.asarray(prompt_len) + 10
        fn = jax.jit(
            lambda t, kv: wmod.decode_step(
                eng.params, eng.cfg, t, pos, prompt_pad + 10,
                jnp.asarray(prompt_len), prompt_pad, kv, cross,
            )[0]
        )
        return _time(lambda: fn(tok, kv))

    def window_cost(kwin: int):
        kv = wmod.init_self_kv(cfg_t, 1, cache_len)
        win = jnp.full((1, kwin), 100, jnp.int32)
        wpos = jnp.asarray(prompt_len)[:, None] + 10 + jnp.arange(kwin)[None]
        fn = jax.jit(
            lambda w, kv: wmod.decode_window(
                target.params, cfg_t, w, wpos, prompt_pad + 10,
                jnp.asarray(prompt_len), prompt_pad, kv, cross_t,
            )[0]
        )
        return _time(lambda: fn(win, kv))

    t_step = step_cost(target, cross_t)
    d_step = step_cost(draft, cross_d)
    w_cost = window_cost(args.k + 1)
    print(f"target step  : {t_step*1e3:8.2f} ms")
    print(f"draft step   : {d_step*1e3:8.2f} ms  ({d_step/t_step:.2f}x target)")
    print(f"verify window: {w_cost*1e3:8.2f} ms for {args.k+1} tokens "
          f"({w_cost/t_step:.2f}x one step)")

    # ---- e2e: full speculative decode on-chip, exactness vs plain ----------
    # warm both programs first: cold XLA compiles take minutes here and the
    # persistent cache does not work cross-process — unwarmed timings would
    # be compile-dominated and meaningless
    spec.decode(cross_t, cross_d, prompt, sot, opts)
    target.decode_batch(cross_t, [prompt], [sot], opts, temperatures=[0.0])
    t0 = time.monotonic()
    r_spec = spec.decode(cross_t, cross_d, prompt, sot, opts)
    spec_s = time.monotonic() - t0  # decode() fetches via _extract_results
    t0 = time.monotonic()
    (r_plain,) = target.decode_batch(
        cross_t, [prompt], [sot], opts, temperatures=[0.0]
    )
    plain_s = time.monotonic() - t0
    exact = bool(np.array_equal(r_spec.tokens, r_plain.tokens))
    print(f"e2e spec decode: {spec_s:.2f}s ({len(r_spec.tokens)} tokens, "
          f"acceptance {spec.acceptance_rate():.2f}), plain {plain_s:.2f}s, "
          f"token-exact: {exact}")

    # ---- projected speedup curve -------------------------------------------
    k = args.k
    round_cost = k * d_step + w_cost
    curve = {}
    for a in (0.0, 0.5, 0.7, 0.8, 0.9, 1.0):
        emitted = 1 + a * k
        curve[f"a={a}"] = round(emitted / (round_cost / t_step), 2)
    print("projected decode speedup vs acceptance "
          f"(measured costs, k={k}): {curve}")

    print(json.dumps({
        "metric": "speculative_cost_model",
        "value": curve["a=0.8"],
        "unit": "x_decode_speedup_at_80pct_acceptance",
        "detail": {
            "model": args.model, "draft": args.draft, "k": k,
            "target_step_ms": round(t_step * 1e3, 2),
            "draft_step_ms": round(d_step * 1e3, 2),
            "verify_window_ms": round(w_cost * 1e3, 2),
            "e2e_token_exact": exact,
            "e2e_acceptance_random_weights": round(spec.acceptance_rate(), 3),
            "projected_speedup": curve,
        },
    }), flush=True)
