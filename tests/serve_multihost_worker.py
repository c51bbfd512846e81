"""Subprocess worker for tests/test_serve_multihost.py — one REAL process
of a multi-host SERVING job. Process 0 (the leader) runs a live
ContinuousScheduler over a MultihostContinuousEngine and transcribes
three windows; process 1 (a follower) replays the leader's op log on its
identically-built engine. The global mesh is dp=4 x tp=2 over 2 processes
x 4 virtual CPU devices, so slot rows and attention heads BOTH straddle
the process boundary — every insert/step/release is a genuine
cross-process SPMD dispatch (gloo collectives), not a local no-op."""

import json
import os
import sys


def serving_config():
    from whisperlive_tpu.models.whisper import WhisperConfig

    return WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )


def serving_options(word_timestamps: bool = False):
    from whisperlive_tpu.engine.engine import TranscribeOptions

    return TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=20, word_timestamps=word_timestamps,
    )


def visible_tokenizer(cfg):
    """Hermetic tokenizer that decodes every text token visibly: with the
    real BPE vocab unavailable (zero egress) the default tokenizer decodes
    random-weight tokens to '' — assemble_result would drop the empty
    segments, and split_to_word_tokens (the word-timestamps grouper, which
    reads backend.id_to_piece) would produce no words."""
    from whisperlive_tpu.engine.tokenizer import TokenSpec, WhisperTokenizer

    class _VisBackend:
        def encode(self, text):
            return []

        def decode(self, ids):
            return "".join(f" t{int(t)}" for t in ids)

        def id_to_piece(self, token_id):
            return f" t{int(token_id)}"

    return WhisperTokenizer(
        TokenSpec(cfg.n_vocab, multilingual=True), backend=_VisBackend()
    )


def serialize_words(result) -> list:
    return [
        [round(w.start, 3), round(w.end, 3), w.word, round(w.probability, 4)]
        for s in result.segments
        for w in (s.words or [])
    ]


def request_audio():
    """Deterministic 'speech': the same three windows on every process
    and in the reference decode."""
    import numpy as np

    rng = np.random.default_rng(77)
    return [
        (rng.standard_normal(int(16000 * s)) * 0.1).astype(np.float32)
        for s in (3.0, 2.0, 2.5)
    ]


POOL = dict(n_slots=4, prompt_pad=16, ring=64, steps_per_chunk=4,
            cross_ctx=1500)


def main() -> int:
    proc, nproc, port, op_port, local_devices = (int(a) for a in sys.argv[1:6])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisperlive_tpu.parallel import multihost

    assert multihost.init_multihost(f"127.0.0.1:{port}", nproc, proc)

    import jax.numpy as jnp

    from whisperlive_tpu.engine.continuous import ContinuousScheduler
    from whisperlive_tpu.engine.engine import WhisperEngine
    from whisperlive_tpu.engine.scheduler import BatchRequest
    from whisperlive_tpu.models.whisper import init_params
    from whisperlive_tpu.parallel import serve_multihost as smh

    cfg = serving_config()
    sh = multihost.multihost_shardings(tp=2)
    assert sh.dp == nproc * local_devices // 2
    eng = WhisperEngine(
        cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
        batch_buckets=(1, 2), shardings=sh,
        tokenizer=visible_tokenizer(cfg),
    )

    if proc == 0:
        leader = smh.OpLeader(op_port, n_followers=nproc - 1)
        cb = smh.MultihostContinuousEngine(eng, leader=leader, **POOL)
        assert cb.dp_sharded  # 4 slot rows over dp=4: rows straddle hosts
        sched = ContinuousScheduler(eng, cb=cb)
        sched.start()
        try:
            futures = [
                sched.submit(BatchRequest(
                    audio=a, options=serving_options(), uid=f"u{i}",
                ))
                for i, a in enumerate(request_audio())
            ]
            tokens = [list(map(int, f.result(timeout=600).raw_tokens))
                      for f in futures]
            # word-timestamps session: the align program dispatches on
            # the worker thread and is REPLAYED on the follower (the
            # round-4 capability gap: words used to degrade to segment
            # timings in multi-host serving)
            f_w = sched.submit(BatchRequest(
                audio=request_audio()[0],
                options=serving_options(word_timestamps=True), uid="w0",
            ))
            res_w = f_w.result(timeout=600)
            words = serialize_words(res_w)
            tokens_w = list(map(int, res_w.raw_tokens))
        finally:
            sched.stop()
            cb.stop_followers()
        print("WLMHS " + json.dumps({
            "proc": proc, "tokens": tokens,
            "words": words, "tokens_w": tokens_w,
        }), flush=True)
    else:
        cb = smh.MultihostContinuousEngine(eng, **POOL)
        chan = smh.OpFollower(("127.0.0.1", op_port))
        n_ops = smh.run_follower(cb, chan)
        chan.close()
        print("WLMHS " + json.dumps({"proc": proc, "ops": n_ops}),
              flush=True)
    multihost.barrier("serve-done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
