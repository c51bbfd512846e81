"""Server CLI — flag-parity with the reference's run_server.py:14-145.

Backend note: the reference multiplexes three GPU backends
(faster_whisper/tensorrt/openvino); this framework has ONE TPU engine. The
legacy --backend values are accepted and mapped onto it with a warning
(mirroring the reference's runtime-fallback behavior, server.py:250-259)
so existing launch scripts keep working.
"""

from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="whisperlive-tpu server")
    parser.add_argument("--port", "-p", type=int, default=9090,
                        help="Websocket port to run the server on.")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--backend", "-b", type=str, default="tpu",
                        choices=["tpu", "faster_whisper", "tensorrt", "openvino"],
                        help="Backend name (legacy values map to 'tpu').")
    parser.add_argument("--model", "-m", type=str, default="small",
                        help="Whisper model size (tiny..large-v3, distil-*, "
                             "turbo) for random/converted init.")
    parser.add_argument("--tpu_model_path", "-tpu", type=str, default=None,
                        help="Path to a converted checkpoint dir or HF checkpoint dir.")
    parser.add_argument("--faster_whisper_custom_model_path", "-fw", type=str,
                        default=None, help="(accepted for parity; treated as checkpoint dir)")
    parser.add_argument("--trt_model_path", "-trt", type=str, default=None,
                        help="(accepted for parity; treated as checkpoint dir)")
    parser.add_argument("--trt_multilingual", action="store_true",
                        help="(parity flag; multilingual-ness comes from the checkpoint)")
    parser.add_argument("--trt_py_session", action="store_true", help="(parity no-op)")
    parser.add_argument("--omp_num_threads", "-omp", type=int, default=1,
                        help="Number of threads for numpy/BLAS host work.")
    parser.add_argument("--no_single_model", action="store_true",
                        help="(parity no-op: the TPU engine is always shared)")
    parser.add_argument("--max_clients", type=int, default=4,
                        help="Maximum concurrent client connections.")
    parser.add_argument("--max_connection_time", type=int, default=600,
                        help="Per-client connection time budget in seconds.")
    parser.add_argument("--cache_path", "-c", type=str, default="~/.cache/whisper-live-tpu/",
                        help="Converted-checkpoint cache directory.")
    parser.add_argument("--enable_rest", action="store_true",
                        help="Enable the OpenAI-compatible REST API.")
    parser.add_argument("--rest_port", type=int, default=9091)
    parser.add_argument("--cors_origins", type=str, default="*",
                        help="Comma-separated allowed CORS origins for REST.")
    parser.add_argument("--batch_inference", action="store_true", default=True,
                        help="Cross-client batching (always on for the TPU engine).")
    parser.add_argument("--batch_max_size", type=int, default=8)
    parser.add_argument("--batch_window_ms", type=int, default=50)
    parser.add_argument("--raw_pcm_input", type=str, default="float32",
                        choices=["float32", "int16", "uint8"],
                        help="Default PCM format when clients don't specify one.")
    parser.add_argument("--metrics_port", type=int, default=None,
                        help="Prometheus /metrics port.")
    parser.add_argument("--api_key", type=str, default=os.environ.get("WL_API_KEY"),
                        help="Require 'Authorization: Bearer <key>' / ?token=.")
    parser.add_argument("--rate_limit_rpm", type=int, default=0,
                        help="Per-IP REST rate limit (requests/minute, 0=off).")
    # TPU-specific
    parser.add_argument("--fake_transcriber", action="store_true",
                        help="Serve a deterministic fake model (protocol testing).")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=[None, "bfloat16", "float32"],
                        help="Override engine compute dtype.")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel degree over the local device mesh.")
    parser.add_argument("--dp", type=int, default=None,
                        help="Data-parallel replicas for SERVING: the "
                             "continuous slot pool scales to dp x "
                             "--continuous_slots and its state shards over "
                             "the mesh's data axis (each replica decodes "
                             "its own slots). Default: n_devices // tp "
                             "when --tp or --dp is given, else 1.")
    parser.add_argument("--beam_size", type=int, default=1,
                        help="Beam width for streaming decodes (1=greedy; the "
                             "reference's transcriber defaults to 5 — wider "
                             "beams shrink the effective device batch).")
    parser.add_argument("--beam_mode", choices=("full", "refresh"),
                        default="full",
                        help="With --beam_size > 1: 'full' beams every "
                             "decode on a lane-multiplied continuous pool "
                             "(slot budget / beam_size); 'refresh' keeps "
                             "the continuous pool greedy at full slot "
                             "count and beams only the full re-decodes "
                             "(periodic WL_PREFIX_REFRESH windows + "
                             "post-commit windows) on the window "
                             "scheduler — greedy partial latency, beamed "
                             "durable output. Composes with "
                             "--continuous_spec.")
    parser.add_argument("--draft_model", type=str, default=None,
                        help="Distil-family draft size for speculative "
                             "decoding of lone greedy window requests "
                             "(e.g. distil-large-v3; must share the "
                             "target's encoder geometry and vocab).")
    parser.add_argument("--draft_path", type=str, default=None,
                        help="Converted/HF checkpoint dir for the draft.")
    parser.add_argument("--spec_k", type=int, default=4,
                        help="Speculation depth (draft tokens per verify "
                             "pass).")
    parser.add_argument("--continuous_spec", action="store_true",
                        help="Speculative CONTINUOUS batching: every "
                             "lockstep chunk becomes a verify round (draft "
                             "proposes spec_k tokens per slot, the target "
                             "verifies in one windowed pass). Requires "
                             "--draft_model/--draft_path and a trained "
                             "draft — at low acceptance each slot's ring "
                             "budget shrinks toward ring/(spec_k+2) tokens "
                             "per window.")
    parser.add_argument("--continuous_spec_mode", choices=("all", "mixed"),
                        default="all",
                        help="With --continuous_spec: 'all' attaches the "
                             "draft to the main pool (every window is "
                             "verify rounds); 'mixed' keeps the main pool "
                             "plain for short incremental tails and routes "
                             "only FULL re-decodes (~100 steps — where a "
                             "verify round pays) to a second speculative "
                             "pool, with acceptance-EMA hysteresis falling "
                             "back to plain below the ~0.25 breakeven "
                             "(WL_SPEC_BREAKEVEN/WL_SPEC_REENABLE/"
                             "WL_SPEC_PROBE_S).")
    parser.add_argument("--spec_slots", type=int, default=8,
                        help="Device slots of the mixed-mode speculative "
                             "pool (full re-decodes only, so fewer than "
                             "--continuous_slots).")
    parser.add_argument("--profile_dir", type=str,
                        default=os.environ.get("WL_PROFILE_DIR"),
                        help="Write JAX profiler (xprof) traces to this dir.")
    parser.add_argument("--no_warmup", action="store_true",
                        help="Skip compiling the serving programs at startup.")
    parser.add_argument("--continuous_batching", action="store_true", default=True,
                        help="Decode-step-level continuous batching: windows "
                             "join a running decode at chunk boundaries "
                             "(default on; greedy path only).")
    parser.add_argument("--no_continuous_batching", dest="continuous_batching",
                        action="store_false")
    parser.add_argument("--continuous_slots", type=int, default=16,
                        help="Device slots for the continuous decode loop.")
    parser.add_argument("--steps_per_chunk", type=int, default=8,
                        help="Decode steps per continuous-loop dispatch "
                             "(join/harvest granularity).")
    parser.add_argument("--continuous_cross_ctx", type=int, default=None,
                        help="Encoder positions of cross-KV kept per "
                             "continuous slot (default 640 = 12.8 s of "
                             "audio; longer windows fall back to the "
                             "window scheduler). Streaming tails are short, "
                             "and every decode step reads all resident "
                             "cross-KV, so this scales the dominant "
                             "per-step HBM term.")
    parser.add_argument("--compilation_cache", type=str,
                        default="~/.cache/whisper-live-tpu/xla-cache",
                        help="Persistent XLA compilation cache dir ('' to disable).")
    parser.add_argument("--multihost_ops_port", type=int, default=19090,
                        help="TCP port of the multi-host serving op log "
                             "(parallel/serve_multihost.py). Active when "
                             "WL_COORDINATOR/WL_NUM_PROCS/WL_PROC_ID are "
                             "set: process 0 serves and broadcasts every "
                             "device op; the others replay them. All "
                             "hosts must launch with IDENTICAL flags. "
                             "The channel is HMAC-authenticated with "
                             "WL_OPS_SECRET (set it on every host).")
    parser.add_argument("--multihost_ops_host", type=str, default=None,
                        help="Interface the leader binds the op log on. "
                             "Default: the WL_COORDINATOR host (the pod-"
                             "internal interface the followers already "
                             "reach) — NOT 0.0.0.0; the op stream carries "
                             "every session's raw audio.")
    return parser


def _build_engine(args, multihost_active: bool = False):
    """Engine + shardings from the CLI flags. Shared by the single-host
    server, the multi-host leader, and multi-host followers — follower
    engines must be constructed EXACTLY like the leader's (the op-replay
    handshake checks a signature, but identical params/geometry are on
    the operator: launch every host with the same flags/checkpoint)."""
    import jax

    if args.compilation_cache:
        path = os.path.expanduser(args.compilation_cache)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)

    from whisperlive_tpu.engine.engine import WhisperEngine
    from whisperlive_tpu.loader import resolve_model

    ckpt = args.tpu_model_path or args.faster_whisper_custom_model_path or args.trt_model_path
    cfg, params, tokenizer = resolve_model(args.model, ckpt)

    compute_dtype = None
    if args.compute_dtype:
        import jax.numpy as jnp

        compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.compute_dtype]

    shardings = None
    if multihost_active:
        from whisperlive_tpu.parallel import multihost

        # the GLOBAL mesh: dp spans hosts, tp stays on each host's ICI
        shardings = multihost.multihost_shardings(tp=args.tp, dp=args.dp)
    elif args.tp > 1 or (args.dp or 1) > 1:
        from whisperlive_tpu.parallel.mesh import EngineShardings

        shardings = EngineShardings.create(tp=args.tp, dp=args.dp)

    engine = WhisperEngine(cfg, params, tokenizer=tokenizer,
                           compute_dtype=compute_dtype, shardings=shardings)
    return engine, shardings, compute_dtype, ckpt


def _continuous_pool_kwargs(args, shardings, engine) -> dict:
    """Geometry of the continuous slot pool — one definition so the
    multi-host leader and followers derive identical engines."""
    n_slots = args.continuous_slots
    pool_beam = args.beam_size
    hybrid_beam = args.beam_size > 1 and args.beam_mode == "refresh"
    if hybrid_beam:
        pool_beam = 1
    elif args.beam_size > 1:
        n_slots = max(2, args.continuous_slots // args.beam_size)
    if shardings is not None and shardings.dp > 1:
        n_slots *= shardings.dp
    return dict(
        n_slots=n_slots,
        steps_per_chunk=args.steps_per_chunk,
        cross_ctx=args.continuous_cross_ctx,
        beam_width=pool_beam,
        spec_k=args.spec_k,
    )


def create_backend(args, multihost_active: bool = False):
    """Build the (backend, name) pair the server serves with."""
    from whisperlive_tpu.serving.backends import FakeBackend, TpuBackend

    if args.fake_transcriber:
        return FakeBackend(), "fake"

    from whisperlive_tpu.engine.scheduler import BatchScheduler

    if multihost_active:
        # Only continuous-engine ops are replayed on follower hosts, so
        # multi-host serving is continuous-only (backends.py coerces
        # stray window-path options) — modes that REQUIRE the window
        # scheduler cannot run.
        if not args.continuous_batching:
            raise SystemExit(
                "multi-host serving requires continuous batching "
                "(drop --no_continuous_batching)"
            )
        if args.beam_size > 1 and args.beam_mode == "refresh":
            raise SystemExit(
                "--beam_mode refresh routes full re-decodes through the "
                "window scheduler, which multi-host serving cannot replay; "
                "use --beam_mode full"
            )
        if args.continuous_cross_ctx is None:
            # default the content cap to the FULL encoder context so no
            # window is long enough to need the (absent) window path
            args.continuous_cross_ctx = 0  # resolved to full below

    engine, shardings, compute_dtype, ckpt = _build_engine(
        args, multihost_active
    )
    if multihost_active and args.continuous_cross_ctx == 0:
        args.continuous_cross_ctx = engine.cfg.n_audio_ctx
    if not args.no_warmup and not multihost_active:
        # every bucket the scheduler can produce — a cold compile at runtime
        # stalls all live streams for minutes on this class of deployment —
        # and with the SAME beam policy the backend will serve with
        # (multi-host: the WINDOW programs are never replayed on follower
        # hosts, so dispatching them here would stall the global mesh —
        # only the continuous warmup below runs, through the op log)
        from whisperlive_tpu.serving.backends import transcribe_options_from_session
        from whisperlive_tpu.serving.session import SessionOptions

        if args.beam_size > 1 and args.beam_mode == "refresh":
            # hybrid beam serves preemptible (chunked) beamed fulls —
            # enable BEFORE warmup so the segment programs compile now
            engine.enable_beam_chunk()
        engine.warmup(
            batch_sizes={b for b in engine.batch_buckets if b <= args.batch_max_size},
            options=transcribe_options_from_session(
                SessionOptions(), beam_size=args.beam_size
            ),
        )
    spec_decoder = None
    draft_engine = None
    hybrid_beam = args.beam_size > 1 and args.beam_mode == "refresh"
    if multihost_active and (args.draft_model or args.draft_path):
        # window-path speculation can't run (not replayed); the draft
        # serves --continuous_spec only
        from whisperlive_tpu.loader import load_engine

        draft_engine = load_engine(
            args.draft_model or "distil-large-v3", args.draft_path,
            compute_dtype=compute_dtype, shardings=shardings,
        )
        if not args.continuous_spec:
            logging.warning(
                "multi-host serving uses a draft only with "
                "--continuous_spec; window-path speculation is disabled"
            )
        else:
            _warn_draft_ctx(args, for_continuous=True)
    elif (args.draft_model or args.draft_path) and args.beam_size > 1 \
            and not hybrid_beam:
        # every server-built window request carries beam_size, and the
        # speculative route requires beam 1 — don't spend HBM + minutes of
        # warmup compiles on a path that can never fire
        logging.warning(
            "--draft_model is ignored with --beam_size %d --beam_mode full: "
            "the speculative route serves greedy requests only",
            args.beam_size,
        )
    elif (args.draft_model or args.draft_path) and hybrid_beam:
        # hybrid beam: partials are greedy on the continuous pool, so the
        # draft composes with --continuous_spec there; the window-side
        # SpeculativeDecoder route can never fire (window requests carry
        # the beam), so skip its warmup
        from whisperlive_tpu.loader import load_engine

        draft_engine = load_engine(
            args.draft_model or "distil-large-v3", args.draft_path,
            compute_dtype=compute_dtype,
            shardings=shardings,
        )
        _warn_draft_ctx(args, for_continuous=True)
    elif args.draft_model or args.draft_path:
        from whisperlive_tpu.engine.speculative import SpeculativeDecoder
        from whisperlive_tpu.loader import load_engine

        draft_engine = load_engine(
            args.draft_model or "distil-large-v3", args.draft_path,
            compute_dtype=compute_dtype,
            # under --tp/--dp the draft must live on the same mesh as the
            # encoder output it projects from
            shardings=shardings,
        )
        _warn_draft_ctx(args, for_continuous=args.continuous_spec)
        spec_decoder = SpeculativeDecoder(engine, draft_engine, k=args.spec_k)
        if not args.no_warmup:
            from whisperlive_tpu.serving.backends import (
                transcribe_options_from_session,
            )
            from whisperlive_tpu.serving.session import SessionOptions

            spec_decoder.warmup(
                options=transcribe_options_from_session(SessionOptions())
            )
        logging.info("speculative serving: draft=%s k=%d (lone greedy "
                     "window requests)", args.draft_model or args.draft_path,
                     args.spec_k)

    scheduler = BatchScheduler(
        engine,
        max_batch_size=args.batch_max_size,
        batch_window_ms=args.batch_window_ms,
        spec_decoder=spec_decoder,
    )
    if not multihost_active:
        # multi-host: the window scheduler stays constructed (TpuBackend
        # reads engine metadata from it) but never started — its device
        # ops are not replayed on follower hosts
        scheduler.start()
    continuous = None
    if args.continuous_batching:
        from whisperlive_tpu.engine.continuous import ContinuousScheduler

        # --beam_size > 1: each slot owns beam_size lockstep lanes, so
        # beamed serving KEEPS continuous batching and incremental
        # decoding (T>0 fallback retries become best-of-K sampling).
        # Resident state scales with slots*beams — shrink the slot pool
        # to bound HBM. Geometry shared with multi-host followers via
        # _continuous_pool_kwargs.
        pool = _continuous_pool_kwargs(args, shardings, engine)
        if hybrid_beam:
            logging.info(
                "hybrid beam serving: greedy continuous pool (%d slots), "
                "beam-%d full re-decodes on the window scheduler",
                pool["n_slots"], args.beam_size,
            )
        elif args.beam_size > 1:
            logging.info(
                "continuous beam serving: %d slots x %d lanes",
                pool["n_slots"], args.beam_size,
            )
        if shardings is not None and shardings.dp > 1:
            logging.info(
                "dp x tp serving: %d slots total over dp=%d x tp=%d",
                pool["n_slots"], shardings.dp, shardings.tp,
            )
        cont_draft = None
        spec_mixed = False
        if args.continuous_spec:
            if draft_engine is None:
                logging.warning(
                    "--continuous_spec ignored: no draft loaded (give "
                    "--draft_model/--draft_path with --beam_size 1)"
                )
            elif args.continuous_spec_mode == "mixed":
                if multihost_active:
                    raise SystemExit(
                        "--continuous_spec_mode mixed needs a second "
                        "continuous pool, whose ops are not replayed on "
                        "follower hosts; use 'all' with multi-host serving"
                    )
                spec_mixed = True
                logging.info(
                    "mixed speculative routing: full re-decodes on a "
                    "%d-slot spec pool (k=%d), incremental tails plain",
                    args.spec_slots, args.spec_k,
                )
            else:
                cont_draft = draft_engine
                logging.info(
                    "speculative continuous batching: k=%d verify rounds "
                    "on the lockstep loop", args.spec_k,
                )
        cb = None
        if multihost_active:
            import jax

            from whisperlive_tpu.parallel import serve_multihost as smh

            # Bind the pod-internal interface the followers already reach
            # (the coordinator host IS this leader process), never
            # 0.0.0.0 — the op stream carries every session's raw audio.
            ops_host = args.multihost_ops_host or os.environ.get(
                "WL_COORDINATOR", "127.0.0.1:0"
            ).rsplit(":", 1)[0]
            leader = smh.OpLeader(
                args.multihost_ops_port,
                n_followers=jax.process_count() - 1,
                host=ops_host,
            )
            cb = smh.MultihostContinuousEngine(
                engine, leader=leader, draft_engine=cont_draft, **pool
            )
            logging.info(
                "multi-host serving: leading %d follower hosts over the "
                "op log (port %d)",
                jax.process_count() - 1, args.multihost_ops_port,
            )
        continuous = ContinuousScheduler(
            engine, draft_engine=cont_draft, cb=cb, **pool
        )
        if not args.no_warmup:
            continuous.warmup()
        continuous.start()
    spec_sched = None
    if args.continuous_batching and spec_mixed:
        # The speculative pool serves only full re-decodes: fewer slots,
        # a larger ring (a spec round consumes spec_k+2 ring columns, and
        # a from-scratch window decodes ~100+ tokens), and the measured
        # spec-mode tick of 4 rounds (BENCH_NOTES round 4: halves tick
        # latency for ~50% higher per-round overhead — better p50).
        spec_sched = ContinuousScheduler(
            engine,
            draft_engine=draft_engine,
            n_slots=args.spec_slots,
            steps_per_chunk=min(args.steps_per_chunk, 4),
            cross_ctx=args.continuous_cross_ctx,
            ring=192,
            spec_k=args.spec_k,
        )
        if not args.no_warmup:
            spec_sched.warmup()
        spec_sched.start()
    if args.beam_size > 1 and args.batch_max_size * args.beam_size > 16:
        logging.warning(
            "batch_max_size*beam_size=%d may exceed HBM; consider lowering "
            "--batch_max_size", args.batch_max_size * args.beam_size)
    return TpuBackend(scheduler, model_name=args.model if not ckpt else ckpt,
                      beam_size=args.beam_size,
                      continuous_scheduler=continuous,
                      beam_mode=args.beam_mode,
                      continuous_only=multihost_active,
                      spec_scheduler=spec_sched), "tpu"


def _warn_draft_ctx(args, for_continuous: bool) -> None:
    """A draft only matches its target at the encoder context it was
    distilled at (BENCH_NOTES round 4): continuous streaming encodes
    short tails at 512 positions, offline/window serving at the full
    context — warn when the deployment doesn't match the checkpoint's
    recorded distill_enc_ctx."""
    from whisperlive_tpu.loader import draft_distill_ctx

    d_ctx = draft_distill_ctx(args.draft_path)
    if not d_ctx:
        return
    if for_continuous and d_ctx != 512:
        msg = (
            f"draft distilled at enc_ctx={d_ctx} but --continuous_spec "
            "verifies at 512-position tail encodes — acceptance will "
            "collapse; distill with --enc_ctx 512"
        )
        if args.continuous_spec and args.continuous_cross_ctx is None:
            # a misconfigured draft silently serves at ~0 acceptance
            # (every verify round wasted) — fail fast at startup; a
            # non-default --continuous_cross_ctx changes the tail-encode
            # context, so only warn there
            raise SystemExit(msg)
        logging.warning("%s", msg)
    if not for_continuous and d_ctx != 1500:
        logging.warning(
            "draft distilled at enc_ctx=%d but window/offline speculation "
            "verifies at the full 1500-position encode — acceptance will "
            "collapse; distill with --enc_ctx 0 (full)", d_ctx,
        )


def _run_multihost_follower(args) -> None:
    """A non-primary host of a multi-host serving job: build the same
    engines the leader builds, then replay its op log until it stops."""
    import jax

    from whisperlive_tpu.parallel import serve_multihost as smh

    engine, shardings, compute_dtype, _ = _build_engine(args, True)
    if args.continuous_cross_ctx in (None, 0):
        args.continuous_cross_ctx = engine.cfg.n_audio_ctx
    cont_draft = None
    if args.continuous_spec and (args.draft_model or args.draft_path):
        from whisperlive_tpu.loader import load_engine

        cont_draft = load_engine(
            args.draft_model or "distil-large-v3", args.draft_path,
            compute_dtype=compute_dtype, shardings=shardings,
        )
    pool = _continuous_pool_kwargs(args, shardings, engine)
    cb = smh.MultihostContinuousEngine(
        engine, draft_engine=cont_draft, **pool
    )
    leader_host = os.environ.get("WL_COORDINATOR", "127.0.0.1:0").rsplit(":", 1)[0]
    logging.info(
        "multi-host follower %d/%d: replaying ops from %s:%d",
        jax.process_index(), jax.process_count(),
        leader_host, args.multihost_ops_port,
    )
    chan = smh.OpFollower((leader_host, args.multihost_ops_port))
    smh.run_follower(cb, chan)
    chan.close()
    logging.info("multi-host follower: leader stopped; exiting")


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    if args.backend != "tpu":
        logging.warning("backend %r is a legacy name; serving with the TPU engine",
                        args.backend)
    os.environ["OMP_NUM_THREADS"] = str(args.omp_num_threads)

    if args.profile_dir:
        from whisperlive_tpu.utils.profiling import start_profiler

        start_profiler(args.profile_dir)

    # Multi-host serving: WL_COORDINATOR/WL_NUM_PROCS/WL_PROC_ID on every
    # host (same env contract as multi-host training) turn the fleet into
    # ONE sliced engine — process 0 serves, the rest replay its op log.
    from whisperlive_tpu.parallel import multihost

    multihost_active = multihost.init_multihost()
    if multihost_active and args.fake_transcriber:
        raise SystemExit("--fake_transcriber has no multi-host mode")
    if multihost_active and not multihost.is_primary():
        _run_multihost_follower(args)
        return
    if multihost_active and args.enable_rest:
        # REST offline files ride the window scheduler's seek loop, which
        # followers cannot replay
        logging.warning("multi-host serving disables the REST API")
        args.enable_rest = False

    backend, name = create_backend(args, multihost_active=multihost_active)

    from whisperlive_tpu.serving.server import TranscriptionServer

    server = TranscriptionServer()
    server.raw_pcm_default = args.raw_pcm_input
    rest_kwargs = dict(
        cors_origins=args.cors_origins.split(","),
        api_key=args.api_key,
        rate_limit_rpm=args.rate_limit_rpm,
    )
    server.run(
        backend,
        host=args.host,
        port=args.port,
        backend_name=name if args.backend == "tpu" else args.backend,
        max_clients=args.max_clients,
        max_connection_time=args.max_connection_time,
        api_key=args.api_key,
        metrics_port=args.metrics_port,
        rest_port=args.rest_port if args.enable_rest else None,
        rest_kwargs=rest_kwargs,
    )


if __name__ == "__main__":
    main()
