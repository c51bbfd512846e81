#!/usr/bin/env python
"""Offline transcription with speculative decoding (library surface).

A distil-family draft proposes k tokens per round; the target verifies
them in one pass — output is token-exact vs plain greedy decoding, only
faster on trained drafts (engine/speculative.py). Produce a draft with
scripts/distill_draft.py or convert a public distil checkpoint.

    python examples/speculative_offline.py audio.wav \
        --target <large-v3 ckpt> --draft <distil-large-v3 ckpt>
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--target", default=None, help="converted/HF ckpt dir")
    ap.add_argument("--draft", default=None, help="converted/HF ckpt dir")
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--draft_model", default="distil-large-v3")
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    from whisperlive_tpu.audio.io import load_audio
    from whisperlive_tpu.engine.speculative import SpeculativeDecoder
    from whisperlive_tpu.engine.transcribe import Transcriber
    from whisperlive_tpu.loader import load_engine

    target = load_engine(args.model, args.target)
    draft = load_engine(args.draft_model, args.draft)
    spec = SpeculativeDecoder(target, draft, k=args.k)

    segments, info = Transcriber(target, spec_decoder=spec).transcribe(
        load_audio(args.audio)
    )
    for s in segments:
        print(f"[{s.start:7.2f} -> {s.end:7.2f}] {s.text}")
    print(
        f"\nlanguage={info.language} (p={info.language_probability:.2f}) "
        f"acceptance={spec.acceptance_rate():.2f} over "
        f"{spec.stats['windows']} windows / {spec.stats['iterations']} rounds"
    )


if __name__ == "__main__":
    main()
