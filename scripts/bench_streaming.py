#!/usr/bin/env python
"""Streaming-serving benchmark: N concurrent real-time streams.

Measures the north-star serving metric (BASELINE.md): partial-segment
latency under N simultaneous real-time 16 kHz streams through the REAL
serving stack — ServeClient session loops + batch scheduler + TPU engine —
with only the websocket transport replaced by an in-process collector.

    python scripts/bench_streaming.py --streams 32 --seconds 20 --model large-v3

Reports p50/p95 latency from chunk-arrival to segment-push, plus achieved
decode cadence per stream. Latency target from BASELINE.json: p50 < 500 ms.
"""

import argparse
import asyncio
import logging
import os
import sys
import time

import numpy as np

logging.basicConfig(
    level=logging.DEBUG if os.environ.get("WL_DEBUG") else logging.WARNING,
    format="%(asctime)s %(name)s %(message)s",
)
# keep jax's own debug chatter out even under WL_DEBUG
logging.getLogger("jax").setLevel(logging.WARNING)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=str, default="32",
                        help="stream count, or comma-separated sweep "
                             "(e.g. 8,16,32) reusing one warm engine")
    parser.add_argument("--seconds", type=float, default=20.0)
    parser.add_argument("--model", type=str, default="large-v3")
    parser.add_argument("--batch_max_size", type=int, default=8)
    parser.add_argument("--batch_window_ms", type=int, default=10)
    parser.add_argument("--chunk_ms", type=int, default=250)
    parser.add_argument("--continuous", action="store_true", default=True,
                        help="decode-step-level continuous batching (default)")
    parser.add_argument("--no_continuous", dest="continuous", action="store_false")
    parser.add_argument("--continuous_slots", type=int, default=16)
    parser.add_argument("--beam_mode", choices=("full", "refresh"),
                        default="full",
                        help="with --beam_size>1: 'refresh' = hybrid beam "
                             "(greedy continuous partials, beamed full "
                             "re-decodes on the window scheduler)")
    parser.add_argument("--beam_size", type=int, default=1,
                        help="lockstep beam lanes per slot (slot pool "
                             "shrinks to continuous_slots/beam_size)")
    parser.add_argument("--steps_per_chunk", type=int, default=8)
    parser.add_argument("--cross_ctx", type=int, default=None,
                        help="continuous cross-KV content cap (positions)")
    parser.add_argument("--ring", type=int, default=128)
    parser.add_argument("--prompt_pad", type=int, default=192)
    parser.add_argument("--continuous_spec", action="store_true",
                        help="speculative continuous batching: chunks become "
                             "verify rounds (needs --draft_path/--draft_model)")
    parser.add_argument("--spec_mixed", action="store_true",
                        help="mixed speculative routing: full re-decodes on "
                             "a second spec pool, incremental tails plain "
                             "(needs --draft_path/--draft_model)")
    parser.add_argument("--spec_slots", type=int, default=8,
                        help="slots of the mixed-mode speculative pool")
    parser.add_argument("--draft_path", type=str, default=None,
                        help="converted checkpoint dir of a distilled draft "
                             "(scripts/distill_draft.py output)")
    parser.add_argument("--draft_model", type=str, default=None,
                        help="draft size for random init (distil-large-v3...)")
    parser.add_argument("--spec_k", type=int, default=4)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu) — the env var "
                             "is too late under the axon sitecustomize")
    parser.add_argument("--tail_cap_s", type=float, default=0.0,
                        help="cap the un-committed tail fed to the backend, "
                             "emulating steady-state sessions: with random "
                             "weights nothing ever commits so tails grow "
                             "without bound, an artifact trained weights "
                             "don't have (commits advance the cursor and "
                             "keep tails at a few seconds). 0 = no cap. "
                             "NOTE: the cap slides the window start while "
                             "the anchor stays fixed, so carried prefixes "
                             "describe slightly stale audio — device work "
                             "still matches production because the "
                             "prefix-refresh cycle (WL_PREFIX_REFRESH) "
                             "forces the same periodic full re-decodes "
                             "that commits force in production.")
    parser.add_argument("--tokens_per_s", type=float, default=10.0,
                        help="emulated decode length per window (random "
                             "weights never hit EOT; real speech decodes "
                             "~8-12 tokens/s of audio then stops). 0 = "
                             "decode the full token budget every window.")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from whisperlive_tpu.engine.engine import WhisperEngine
    from whisperlive_tpu.engine.scheduler import BatchScheduler
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params
    from whisperlive_tpu.serving.backends import TpuBackend
    from whisperlive_tpu.serving.server import ServeClient
    from whisperlive_tpu.serving.session import SessionOptions

    cfg = WHISPER_CONFIGS[args.model]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    params = init_params(cfg, 0, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    engine = WhisperEngine(cfg, params)
    draft_engine = None
    if (args.continuous_spec or args.spec_mixed) and (
        args.draft_path or args.draft_model
    ):
        from whisperlive_tpu.loader import load_engine

        draft_engine = load_engine(
            args.draft_model or "distil-large-v3", args.draft_path
        )
        from whisperlive_tpu.loader import draft_distill_ctx

        d_ctx = draft_distill_ctx(args.draft_path)
        if d_ctx and d_ctx != 512:
            print(
                f"WARNING: draft distilled at enc_ctx={d_ctx}, but "
                "continuous streaming encodes short tails at 512 "
                "positions — acceptance will collapse. Distill with "
                "--enc_ctx 512.", file=sys.stderr,
            )
    elif args.continuous_spec or args.spec_mixed:
        raise SystemExit(
            "--continuous_spec/--spec_mixed need --draft_path/--draft_model"
        )
    continuous = None
    spec_sched = None
    if args.continuous:
        from whisperlive_tpu.engine.continuous import ContinuousScheduler

        n_slots = args.continuous_slots
        hybrid_beam = args.beam_size > 1 and args.beam_mode == "refresh"
        if args.beam_size > 1 and not hybrid_beam:
            n_slots = max(2, args.continuous_slots // args.beam_size)
        continuous = ContinuousScheduler(
            engine,
            n_slots=n_slots,
            steps_per_chunk=args.steps_per_chunk,
            cross_ctx=args.cross_ctx,
            ring=args.ring,
            prompt_pad=args.prompt_pad,
            beam_width=1 if hybrid_beam else args.beam_size,
            draft_engine=None if args.spec_mixed else draft_engine,
            spec_k=args.spec_k,
        )
        continuous.warmup()
        continuous.start()
        if args.spec_mixed:
            # full re-decodes only: fewer slots, larger ring (a spec round
            # consumes k+2 columns; from-scratch windows decode ~100+
            # tokens), 4-round ticks (the measured spec-mode setting)
            spec_sched = ContinuousScheduler(
                engine,
                draft_engine=draft_engine,
                n_slots=args.spec_slots,
                steps_per_chunk=min(args.steps_per_chunk, 4),
                cross_ctx=args.cross_ctx,
                ring=192,
                prompt_pad=args.prompt_pad,
                spec_k=args.spec_k,
            )
            spec_sched.warmup()
            spec_sched.start()
        if hybrid_beam:
            # the beamed full re-decodes run on the window scheduler —
            # warm its beamed program for the buckets it will hit
            from whisperlive_tpu.serving.backends import (
                transcribe_options_from_session,
            )
            buckets = [b for b in engine.batch_buckets if b <= args.batch_max_size]
            # hybrid serves preemptible (chunked) beamed fulls — enable
            # BEFORE warmup so the segment programs compile now
            engine.enable_beam_chunk()
            engine.warmup(
                batch_sizes=set(buckets),
                options=transcribe_options_from_session(
                    SessionOptions(), beam_size=args.beam_size
                ),
            )
        if args.tail_cap_s == 0 or args.tail_cap_s > continuous.max_window_s:
            # without a tail cap, tails outgrow the continuous content cap
            # (~12.8 s) mid-run and overflow to the WINDOW scheduler — warm
            # it too or those windows hit minutes-long cold compiles
            buckets = [b for b in engine.batch_buckets if b <= args.batch_max_size]
            engine.warmup(batch_sizes=set(buckets))
    else:
        # warm every batch bucket the scheduler can produce — a cold compile
        # at runtime stalls all streams for minutes
        buckets = [b for b in engine.batch_buckets if b <= args.batch_max_size]
        engine.warmup(batch_sizes=set(buckets))
    scheduler = BatchScheduler(
        engine,
        max_batch_size=args.batch_max_size,
        batch_window_ms=args.batch_window_ms,
    )
    scheduler.start()

    class MeasuringBackend(TpuBackend):
        """Records per-chunk decode round-trip latency (request -> result)
        through the REAL TpuBackend path (VAD gate skipped via options,
        incremental-prefix decode active)."""

        def _adjust_options(self, topts, chunk):
            import dataclasses

            if args.tokens_per_s > 0:
                # random weights never emit EOT: emulate trained-weights
                # behavior (decode length tracks the audio) so slot/batch
                # turnover matches production. With an incremental prefix
                # the continuous scheduler subtracts the prefix length, so
                # only the new tail is sampled — as with real weights.
                budget = max(4, int(len(chunk) / 16000 * args.tokens_per_s))
                topts = dataclasses.replace(
                    topts, max_new_tokens=min(budget, topts.max_new_tokens or budget)
                )
            return topts

        async def transcribe(self, chunk, options, **kw):
            t0 = time.monotonic()
            if args.tail_cap_s > 0:
                cap = int(args.tail_cap_s * 16000)
                chunk = chunk[-cap:]
                inner = kw.get("refresh_audio")
                if inner is not None:
                    # the late-bound refresh must emulate the same
                    # steady-state tail cap as the snapshot
                    kw["refresh_audio"] = lambda: (
                        lambda f: None if f is None else f[-cap:]
                    )(inner())
            result = await super().transcribe(chunk, options, **kw)
            now = time.monotonic()
            latencies.append(now - t0)
            if result is not None and result.audio_bound_at > 0:
                # honest content-age: how stale the newest decoded audio
                # was when the partial came back (late-bound refresh makes
                # this < round-trip once requests queue)
                staleness.append(now - result.audio_bound_at)
            idx = int(kw.get("uid", "s0")[1:])
            updates_per_stream[idx] += 1
            # starvation metric: the longest wait any stream endured
            # between two consecutive updates (fairness at
            # oversubscription — least-recently-served-uid slot grants)
            prev = last_update_time[idx]
            if prev is not None:
                update_gaps[idx] = max(update_gaps[idx], now - prev)
            last_update_time[idx] = now
            return result

    backend = MeasuringBackend(scheduler, continuous_scheduler=continuous,
                               beam_size=args.beam_size,
                               beam_mode=args.beam_mode,
                               spec_scheduler=spec_sched)
    backend.request_timeout_s = 180.0  # survive rare cold-shape compiles

    chunk_samples = int(16000 * args.chunk_ms / 1000)

    latencies: list[float] = []
    staleness: list[float] = []
    updates_per_stream: list[int] = []
    update_gaps: list[float] = []
    last_update_time: list = []

    async def run(n_streams: int) -> None:
        clients = []
        last_feed_time = [0.0] * n_streams

        for i in range(n_streams):
            idx = i

            async def send_json(payload, idx=idx):
                pass  # latency is measured at the backend round-trip

            client = ServeClient(
                websocket=None,
                uid=f"s{i}",
                options=SessionOptions(language="en", use_vad=False,
                                       same_output_threshold=7),
                backend=backend,
                send_json=send_json,
            )
            client.start()
            clients.append(client)

        n_chunks = int(args.seconds * 1000 / args.chunk_ms)
        t0 = time.monotonic()
        for c in range(n_chunks):
            target = t0 + (c + 1) * args.chunk_ms / 1000
            for i, client in enumerate(clients):
                tone = 100 + 10 * i
                t = (np.arange(chunk_samples) + c * chunk_samples) / 16000
                audio = (
                    0.2 * np.sin(2 * np.pi * 3 * t) * np.sin(2 * np.pi * tone * t)
                ).astype(np.float32)
                last_feed_time[i] = time.monotonic()
                client.add_frames(audio)
            delay = target - time.monotonic()
            if delay > 0:
                await asyncio.sleep(delay)
        # drain
        await asyncio.sleep(2.0)
        for client in clients:
            await client.cleanup()

    import json

    # Continuous-tick roofline (VERDICT r4 item 2): the measured per-tick
    # step time vs a modeled lower bound for steps_per_chunk lockstep
    # decode steps over the FULL resident slot pool, on envelopes measured
    # under dispatch overlap on THIS device. tick_sol_frac near 1 means
    # the tick is at the device's memory/compute floor (the latency is
    # compute-floored); well under 1 means code/dispatch headroom remains.
    tick_roof_ms = None
    peaks = {}
    if continuous is not None and os.environ.get("WL_MEASURE_PEAKS", "1") != "0":
        from whisperlive_tpu.utils import roofline

        cb = continuous.cb
        # Probe the envelopes AT THE SERVING SHAPES: the int8 kernel is
        # latency-bound at the continuous path's per-cell slab size
        # (T=640 measures ~3x the T=2048 bandwidth-bound rate on the
        # relay — roofline.measure_effective_peaks docstring); a
        # wrong-shape roof reads as a fake near-1 "device floor".
        hd = cfg.n_text_state // cfg.n_text_head
        peaks = roofline.measure_effective_peaks(
            kv_shape=(cb.n_rows, cfg.n_text_head, cb.cross_ctx, hd),
            self_shape=(cb.n_rows, cfg.n_text_head, cb.cache_len, hd),
        )
        step_cost = roofline.decode_step_cost(
            cfg, cb.n_rows, cb.cache_len, cross_ctx=cb.cross_ctx,
            cross_kv_bits=engine.cross_kv_bits,
            weight_bits=8 if engine.decoder_int8 else 16,
        )
        if args.continuous_spec:
            # a verify round: the draft decodes k+1 steps, then the target
            # scores a (k+1)-token window in ONE pass (weights + resident
            # KV read once, FLOPs x (k+1), window K/V re-read negligible)
            d_cost = roofline.decode_step_cost(
                draft_engine.cfg, cb.n_rows, cb.cache_len,
                cross_ctx=cb.cross_ctx,
                cross_kv_bits=draft_engine.cross_kv_bits,
                weight_bits=8 if draft_engine.decoder_int8 else 16,
            )
            import dataclasses as _dc

            win_cost = _dc.replace(
                step_cost, flops=step_cost.flops * (args.spec_k + 1)
            )
            round_roof = (args.spec_k + 1) * roofline.step_time_roof(
                d_cost, peaks
            ) + roofline.step_time_roof(win_cost, peaks)
            tick_roof_ms = args.steps_per_chunk * round_roof * 1e3
        else:
            # static full-pool roof; replaced per row by the length-aware
            # model once the row's tick_stats deltas are known (the skip
            # kernels stream only occupied slots' block-padded cross_len)
            tick_roof_ms = (
                args.steps_per_chunk
                * roofline.step_time_roof(step_cost, peaks)
                * 1e3
            )

    for n_streams in [int(x) for x in args.streams.split(",")]:
        latencies.clear()
        staleness.clear()
        updates_per_stream[:] = [0] * n_streams
        update_gaps[:] = [0.0] * n_streams
        last_update_time[:] = [None] * n_streams
        backend._prefix_cache.clear()  # uids repeat across sweeps
        backend._prefix_streak.clear()
        backend._rt_ema.clear()
        backend._spec_enabled = True  # fresh hysteresis per sweep row
        spec_before = (
            dict(continuous.spec_stats) if continuous is not None else {}
        )
        tick_before = (
            dict(continuous.tick_stats) if continuous is not None else {}
        )
        mix_before = (
            dict(spec_sched.spec_stats) if spec_sched is not None else {}
        )
        route_before = (
            dict(backend.spec_route_stats) if spec_sched is not None else {}
        )
        row_t0 = time.monotonic()
        asyncio.run(run(n_streams))
        row_wall = time.monotonic() - row_t0

        latencies_np = np.asarray(latencies)
        updates = np.asarray(updates_per_stream, np.float64)
        cadence = float(np.median(updates)) / args.seconds  # decodes per stream-second
        result = {
            "metric": "p50_partial_latency",
            "value": round(float(np.percentile(latencies_np, 50)), 3) if len(latencies_np) else None,
            "unit": "s",
            "detail": {
                "streams": n_streams,
                "model": args.model,
                "p95_s": round(float(np.percentile(latencies_np, 95)), 3) if len(latencies_np) else None,
                "p50_content_age_s": round(float(np.percentile(staleness, 50)), 3) if staleness else None,
                "p95_content_age_s": round(float(np.percentile(staleness, 95)), 3) if staleness else None,
                "decodes_total": int(len(latencies_np)),
                "decodes_per_stream_per_s": round(cadence, 2),
                "max_update_gap_s": round(max(update_gaps), 2) if update_gaps else None,
                "starved_streams": int(sum(1 for u in updates_per_stream if u == 0)),
                "sustained_realtime": bool(cadence > 0.2),  # update at least every 5 s
                "duration_s": args.seconds,
                "mode": "continuous" if args.continuous else "window",
                "beam_size": args.beam_size,
                "beam_mode": args.beam_mode if args.beam_size > 1 else None,
                "tokens_per_s": args.tokens_per_s,
                "tail_cap_s": args.tail_cap_s,
                "continuous_slots": args.continuous_slots if args.continuous else None,
                "steps_per_chunk": args.steps_per_chunk if args.continuous else None,
            },
        }
        if continuous is not None:
            # dispatch-cost decomposition of the worker loop over this row:
            # where a tick's wall time goes (insert = upload+encode
            # dispatch, step = decode-chunk dispatch + syncing status
            # fetch, harvest = host assembly). step_ms_avg bounds the
            # per-partial floor: a partial needs ceil(tail/steps_per_chunk)
            # ticks, each >= one dispatch+fetch round trip through the
            # relay plus the chunk's device compute.
            td = {
                k: continuous.tick_stats[k] - tick_before.get(k, 0)
                for k in continuous.tick_stats
            }
            n_ticks = max(td["ticks"], 1)
            result["detail"].update(
                ticks=td["ticks"],
                ticks_per_s=round(td["ticks"] / max(row_wall, 1e-9), 2),
                step_ms_avg=round(td["step_s"] / n_ticks * 1e3, 1),
                insert_ms_avg=round(
                    td["insert_s"] / max(td["insert_calls"], 1) * 1e3, 1
                ),
                insert_calls=td["insert_calls"],
                insert_windows=td["insert_windows"],
                harvest_ms_avg=round(td["harvest_s"] / n_ticks * 1e3, 1),
                loop_busy_frac=round(
                    (td["insert_s"] + td["step_s"] + td["harvest_s"])
                    / max(row_wall, 1e-9), 3,
                ),
            )
            row_roof_ms = tick_roof_ms
            if (
                tick_roof_ms is not None
                and not args.continuous_spec
                and td.get("step_rows", 0)
                and td["ticks"]
            ):
                from whisperlive_tpu.utils import roofline

                # length-aware roof: charge cross-KV for what the block-
                # DMA kernels actually streamed this row (tick averages)
                cb = continuous.cb
                row_cost = roofline.continuous_step_cost(
                    cfg, cb.n_rows, cb.cache_len,
                    cross_positions=td["step_cross_pos"] / td["ticks"],
                    cross_kv_bits=engine.cross_kv_bits,
                    weight_bits=8 if engine.decoder_int8 else 16,
                )
                row_roof_ms = (
                    args.steps_per_chunk
                    * roofline.step_time_roof(row_cost, peaks)
                    * 1e3
                )
            if row_roof_ms is not None and td["ticks"]:
                step_ms = td["step_s"] / n_ticks * 1e3
                result["detail"].update(
                    tick_roof_ms=round(row_roof_ms, 1),
                    # achieved-vs-roof: fraction of the modeled device
                    # floor the measured tick reaches (<= ~1; the roof
                    # assumes the FULL slot pool resident every step)
                    tick_sol_frac=round(row_roof_ms / max(step_ms, 1e-9), 3),
                    measured_peaks={
                        k: round(v, 1) for k, v in peaks.items()
                    } or None,
                )
        if args.continuous_spec and continuous is not None:
            d = {
                k: continuous.spec_stats[k] - spec_before.get(k, 0)
                for k in continuous.spec_stats
            }
            acc = (
                max(0.0, (d["committed"] - d["rounds"]) / (d["rounds"] * args.spec_k))
                if d["rounds"] else 0.0
            )
            result["detail"].update(
                spec_k=args.spec_k,
                spec_windows=d["windows"],
                spec_rounds=d["rounds"],
                spec_committed=d["committed"],
                spec_acceptance=round(acc, 3),
            )
        if spec_sched is not None:
            d = {
                k: spec_sched.spec_stats[k] - mix_before.get(k, 0)
                for k in spec_sched.spec_stats
            }
            acc = (
                max(0.0, (d["committed"] - d["rounds"]) / (d["rounds"] * args.spec_k))
                if d["rounds"] else 0.0
            )
            result["detail"].update(
                spec_mixed=True,
                spec_k=args.spec_k,
                spec_windows=d["windows"],
                spec_acceptance=round(acc, 3),
                spec_acceptance_ema=round(spec_sched.acceptance_ema, 3),
                spec_routing={
                    k: backend.spec_route_stats[k] - route_before.get(k, 0)
                    for k in backend.spec_route_stats
                },
            )
        print(json.dumps(result), flush=True)

    scheduler.stop()
    if continuous is not None:
        continuous.stop()
    if spec_sched is not None:
        spec_sched.stop()


if __name__ == "__main__":
    main()
