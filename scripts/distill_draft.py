"""Distill a speculative draft from a Whisper teacher.

Pipeline (distil-whisper recipe on this framework's training stack):
  1. pseudo-label a pool of audio with the TEACHER's greedy decode,
  2. initialize the student = shared encoder + maximally-spaced teacher
     decoder layers (whisperlive_tpu/distill.py),
  3. minimize KL(teacher||student) + CE(pseudo-labels) with the teacher
     frozen — the CE term is literally the speculative acceptance
     criterion, so the objective directly optimizes draft agreement,
  4. save a converted-checkpoint dir ready for
     `whisperlive-tpu-transcribe --draft_path <out>` /
     SpeculativeDecoder.

With no real checkpoint/audio in the environment this runs on random
weights + synthetic audio and reports teacher-forced agreement before and
after (the quality bar needs real weights; the pipeline does not).

Usage:
  python scripts/distill_draft.py --model tiny [-tpu <teacher-ckpt>]
      [--layers 2] [--steps 300] [--batch 4] [--pool 64]
      [--audio_dir <dir-of-wav-flac>] --out /tmp/draft-ckpt
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("distill_draft")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("-tpu", "--tpu_model_path", default=None)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--pool", type=int, default=64,
                    help="Pseudo-labeled training clips.")
    ap.add_argument("--seq", type=int, default=48,
                    help="Teacher-forced sequence length.")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--audio_dir", default=None,
                    help="Directory of wav/flac clips (synthetic if unset).")
    ap.add_argument("--enc_ctx", type=int, default=0,
                    help="Encoder context positions the draft will SERVE "
                         "at (0 = full 30 s windows, the offline-CLI "
                         "path). Streaming serves short tails at reduced "
                         "context (512 by default) and a draft must be "
                         "distilled AT that context: the encoder's output "
                         "distribution shifts with position count, so a "
                         "full-context draft's agreement does not "
                         "transfer (measured 0.985 -> 0.34 on random "
                         "weights, BENCH_NOTES round 4). Use --enc_ctx "
                         "512 for --continuous_spec serving drafts.")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for the CI "
                         "smoke) — the env var is too late under the "
                         "axon sitecustomize")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from whisperlive_tpu import distill
    from whisperlive_tpu.engine.engine import TranscribeOptions
    from whisperlive_tpu.loader import load_engine
    from whisperlive_tpu.models import convert as convert_mod
    from whisperlive_tpu.ops import mel as mel_ops
    from whisperlive_tpu.training import make_optimizer

    rng = np.random.default_rng(args.seed)
    # The teacher's numerics must match the SERVING verifier the draft
    # will be judged against, so load it exactly as serving does (decoder
    # int8 on TPU): pseudo-labels then decode through the REAL int8
    # kernels. The training-path forwards (KD logits, student init,
    # acceptance eval) cannot run the serving kernels — they get a DENSE
    # tree rebuilt from the quantized one below
    # (models/whisper.py::dequantize_decoder_weights), carrying the
    # dequantized values including the int8 rounding error. KD against
    # the raw float teacher mis-targets wherever quantization flips an
    # argmax (only the student's decoder is trained; the teacher is
    # frozen either way).
    teacher_eng = load_engine(args.model, args.tpu_model_path)
    cfg_t = teacher_eng.cfg
    cfg_s = distill.student_config(cfg_t, n_text_layer=args.layers)

    # ---- 1. audio pool ------------------------------------------------------
    def synth_clip() -> np.ndarray:
        """Synthetic audio shaped like streaming windows: a variable-length
        signal (0.5-14 s) then silence, mixing a speech-like family
        (harmonics + syllabic AM + noise) with a pure AM-tone family — the
        latter matches scripts/bench_streaming.py's stream audio so the
        distilled draft's measured acceptance there reflects in-distribution
        behavior, the same way a real-speech draft serves real speech."""
        # Streaming windows come in two shapes: a growing young stream
        # (signal from t=0, then silence padding) and — the steady-state
        # majority under a content cap — a FULLY-FILLED window sliced
        # mid-stream at arbitrary signal phase. Train on both, with the
        # window as a slice of a longer signal so phases at the window
        # start are uniform (the encoder is a different function of the
        # same tone at a different phase, and a draft must cover the
        # distribution it will verify against).
        full = rng.random() < 0.5
        # full windows are mid-stream slices (arbitrary phase); young
        # streams anchor at the signal origin (phase 0), like a session
        # whose audio starts with the connection
        t0 = rng.uniform(0.0, 60.0) if full else 0.0
        t = t0 + np.arange(mel_ops.N_SAMPLES) / 16000.0
        if rng.random() < 0.5:
            f0 = rng.uniform(90, 240)
            sig = sum(
                rng.uniform(0.1, 0.4) * np.sin(2 * np.pi * f0 * (h + 1) * t)
                for h in range(4)
            )
            am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t)
            out = sig * am * 0.2 + rng.normal(0, 0.01, t.shape)
        else:
            tone = rng.uniform(100, 420)
            am = rng.uniform(2.0, 4.0)
            out = 0.2 * np.sin(2 * np.pi * am * t) * np.sin(
                2 * np.pi * tone * t
            )
        if full:  # steady-state: window full of signal
            n_live = int(live_cap_s * 16000)
        else:  # young stream: signal then silence
            n_live = int(rng.uniform(0.5, live_cap_s) * 16000)
        out[n_live:] = 0.0
        return out.astype(np.float32)

    enc_ctx = args.enc_ctx or 0
    live_cap_s = min(14.0, enc_ctx * 0.02) if enc_ctx else 14.0
    clips: list[np.ndarray] = []
    if args.audio_dir:
        from whisperlive_tpu.audio.io import load_audio

        for path in sorted(
            glob.glob(os.path.join(args.audio_dir, "*"))
        )[: args.pool]:
            try:
                a = load_audio(path)
            except Exception:
                continue
            a = a[: mel_ops.N_SAMPLES]
            if len(a) < mel_ops.N_SAMPLES:
                a = np.pad(a, (0, mel_ops.N_SAMPLES - len(a)))
            clips.append(a.astype(np.float32))
    while len(clips) < args.pool:
        clips.append(synth_clip())
    audio = np.stack(clips)  # [P, N_SAMPLES]

    # ---- 2. teacher pseudo-labels ------------------------------------------
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=args.seq - 8,
    )
    prompt, sot = teacher_eng.build_prompt(opts, language="en")
    logger.info("pseudo-labeling %d clips with the teacher (enc_ctx=%s)...",
                len(audio), enc_ctx or "full")
    from whisperlive_tpu.models import whisper as wmod

    def encode_serving(params, cfg, clip_b):
        """Encoder features at the context the draft will serve at.

        Streaming inserts encode short tails at a reduced position count
        (continuous.py _insert: mel sliced to the audio bucket, encoder
        positional table sliced to match) — the encoder's output is a
        DIFFERENT function of the same audio at different context sizes,
        so pseudo-labels, KD logits, student forwards and the acceptance
        eval must all run at the serving context."""
        import jax.numpy as _jnp

        mel_b = mel_ops.log_mel_spectrogram(
            _jnp.asarray(clip_b), n_mels=cfg.n_mels
        )
        if enc_ctx:
            mel_b = mel_b[:, : 2 * enc_ctx]
        return wmod.encode(params, cfg, mel_b)

    def quantize_like_engine(cross):
        if teacher_eng.cross_kv_bits == 8:
            return wmod.quantize_cross_kv(cross)
        if teacher_eng.cross_kv_bits == 4:
            return wmod.quantize_cross_kv_int4(cross)
        return cross

    seqs = []
    bs = max(b for b in teacher_eng.batch_buckets if b <= 8)
    for i in range(0, len(audio), bs):
        chunk = audio[i : i + bs]
        pad = np.zeros((bs - len(chunk), audio.shape[1]), np.float32)
        clip_b = np.concatenate([chunk, pad])
        enc_b = encode_serving(teacher_eng.params, cfg_t, clip_b)
        cross = quantize_like_engine(
            wmod.compute_cross_kv(teacher_eng.params, cfg_t, enc_b)
        )
        results = teacher_eng.decode_batch(
            cross, [prompt] * bs, [sot] * bs, opts,
            temperatures=[0.0] * bs,
        )
        for r in results[: len(chunk)]:
            seqs.append(prompt + [int(x) for x in r.tokens])

    # teacher-forced batch arrays: inputs are [prompt + pseudo tokens],
    # loss masked to the generated region (the prompt is given, not
    # predicted — and acceptance only ever runs past the prompt)
    T = args.seq
    tokens_in = np.zeros((len(seqs), T), np.int32)
    loss_mask = np.zeros((len(seqs), T), np.float32)
    for i, s in enumerate(seqs):
        s = s[:T]
        tokens_in[i, : len(s)] = s
        loss_mask[i, len(prompt) - 1 : max(len(s) - 1, len(prompt) - 1)] = 1.0

    # ---- 3. precompute the frozen-teacher constants --------------------------
    # The teacher is frozen, so its encoder features and teacher-forced
    # logits are CONSTANTS of the (clip, pseudo-label) pool. Computing them
    # once turns every KD step into a student-only fwd/bwd (~100x fewer
    # FLOPs at large-v3, where a single encoder pass is ~8 TFLOP), and
    # keeping the pools device-resident with the batch gather inside jit
    # avoids re-uploading ~30 MB/step through the slow host<->device relay
    # (~40 MB/s measured, BENCH_NOTES).
    from whisperlive_tpu.models import whisper as wmod
    from whisperlive_tpu.training import decoder_forward_train

    # dense training-forward tree reproducing the int8 serving decoder's
    # values (no-op when the engine loaded unquantized, e.g. on CPU);
    # bf16 on TPU matches the serving kernels' dequant-in-VMEM compute
    teacher_params = wmod.dequantize_decoder_weights(
        teacher_eng.params,
        dtype=jnp.bfloat16 if teacher_eng.decoder_int8 else jnp.float32,
    )
    P = len(seqs)
    tok_dev = jnp.asarray(tokens_in)
    mask_dev = jnp.asarray(loss_mask)
    eb = 8
    logger.info(
        "precomputing encoder features + teacher logits (%d clips)...", P
    )
    enc_parts, tl_parts = [], []
    for i in range(0, P, eb):
        pad = max(0, i + eb - P)
        clip_b = np.concatenate(
            [audio[i : i + eb]]
            + ([np.zeros((pad, audio.shape[1]), np.float32)] if pad else [])
        )
        tok_b = jnp.concatenate(
            [tok_dev[i : i + eb]]
            + ([jnp.zeros((pad, tok_dev.shape[1]), jnp.int32)] if pad else [])
        )
        enc_b = encode_serving(teacher_params, cfg_t, clip_b)
        tl_b = decoder_forward_train(teacher_params, cfg_t, tok_b, enc_b)
        keep = eb - pad
        enc_parts.append(enc_b[:keep].astype(jnp.bfloat16))
        tl_parts.append(tl_b[:keep].astype(jnp.bfloat16))
    enc_dev = jnp.concatenate(enc_parts)
    tl_dev = jnp.concatenate(tl_parts)

    # ---- 4. KD training ------------------------------------------------------
    opt = make_optimizer(
        learning_rate=args.lr, warmup_steps=min(20, args.steps // 10 + 1),
        total_steps=args.steps,
    )
    # student trains in f32 regardless of the (possibly bf16) teacher —
    # Adam in bf16 loses the small late-training updates
    dec0 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        distill.init_student_from_teacher(teacher_params, args.layers)[
            "decoder"
        ],
    )
    state = distill.DistillState(
        dec0, opt.init(dec0), jnp.zeros((), jnp.int32)
    )
    raw_step = distill.make_distill_step(cfg_s, cfg_t, opt)

    # the teacher tree and the device-resident pools ride as jit ARGUMENTS,
    # not closure captures: a captured array is embedded in the compile
    # payload as a constant, and at large-v3 that is a multi-GB request the
    # remote-compile relay rejects (HTTP 413) — as parameters they stay on
    # device and only shapes ship with the program
    @jax.jit
    def step(st, idx, tparams, enc_all, tl_all, tok_all, mask_all):
        batch = {
            "enc": jnp.take(enc_all, idx, axis=0),
            "t_logits": jnp.take(tl_all, idx, axis=0),
            "tokens_in": jnp.take(tok_all, idx, axis=0),
            "loss_mask": jnp.take(mask_all, idx, axis=0),
        }
        return raw_step(st, tparams, batch)

    n_train = int(P * 0.9)
    hold = slice(n_train, P)

    def acceptance(st) -> float:
        return distill.measure_acceptance(
            teacher_params, distill.student_params(teacher_params, st),
            cfg_t, cfg_s, None, tokens_in[hold], loss_mask[hold],
            enc=enc_dev[hold],
        )

    acc0 = acceptance(state)
    logger.info("held-out teacher-forced agreement BEFORE: %.3f", acc0)
    t0 = time.monotonic()
    for i in range(args.steps):
        idx = jnp.asarray(rng.integers(0, n_train, args.batch), jnp.int32)
        state, loss = step(
            state, idx, teacher_params, enc_dev, tl_dev, tok_dev, mask_dev
        )
        if i % 25 == 0 or i == args.steps - 1:
            logger.info("step %4d  loss %.4f  (%.1fs)", i, float(loss),
                        time.monotonic() - t0)
    acc1 = acceptance(state)
    logger.info("held-out teacher-forced agreement AFTER: %.3f (was %.3f)",
                acc1, acc0)

    # ---- 5. save a draft checkpoint ------------------------------------------
    draft = distill.student_params(teacher_params, state)
    draft = jax.tree.map(lambda x: np.asarray(x, np.float32), draft)
    convert_mod.save_converted(
        args.out, cfg_s, draft,
        extra_meta={"distill_enc_ctx": enc_ctx or cfg_t.n_audio_ctx},
    )
    logger.info(
        "draft saved to %s — serve with: whisperlive-tpu-transcribe "
        "--draft_path %s, or SpeculativeDecoder(target, draft_engine)",
        args.out, args.out,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
