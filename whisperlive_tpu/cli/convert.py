"""Checkpoint conversion CLI: HF Whisper -> whisperlive-tpu cache dir.

The analogue of the reference's engine-build tooling
(scripts/build_whisper_tensorrt.sh + the CTranslate2 auto-conversion in
faster_whisper_backend.py:133-178): one-time conversion of a local HF
checkpoint directory into this framework's orbax format, after which the
server starts instantly from the cache.

    python -m whisperlive_tpu.cli.convert /path/to/hf-whisper-large-v3 \
        --output ~/.cache/whisper-live-tpu/large-v3
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="convert HF Whisper -> whisperlive-tpu")
    parser.add_argument("model_dir", help="HF checkpoint dir (config.json + *.safetensors)")
    parser.add_argument("--output", "-o", required=True, help="output cache dir")
    parser.add_argument("--verify", action="store_true",
                        help="run a numerical parity check vs torch (needs transformers+torch)")
    args = parser.parse_args(argv)

    from whisperlive_tpu.models import convert as convert_mod

    cfg, params = convert_mod.load_hf_checkpoint(args.model_dir)
    logging.info("loaded %s: %d-layer enc / %d-layer dec, d=%d, vocab=%d",
                 args.model_dir, cfg.n_audio_layer, cfg.n_text_layer,
                 cfg.n_audio_state, cfg.n_vocab)

    if args.verify:
        import numpy as np
        import torch
        from transformers import WhisperForConditionalGeneration

        from whisperlive_tpu.models import whisper as wmod

        model = WhisperForConditionalGeneration.from_pretrained(args.model_dir).eval()
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype("float32")
        with torch.no_grad():
            ref = model.model.encoder(
                torch.from_numpy(mel.transpose(0, 2, 1))
            ).last_hidden_state.numpy()
        import jax.numpy as jnp

        ours = np.asarray(wmod.encode(params, cfg, jnp.asarray(mel)))
        err = float(np.abs(ours - ref).max())
        logging.info("encoder parity max abs err: %.2e", err)
        assert err < 5e-3, "conversion parity check failed"

    os.makedirs(args.output, exist_ok=True)
    convert_mod.save_converted(args.output, cfg, params)
    # carry the tokenizer file along so the server picks it up
    tok = os.path.join(args.model_dir, "tokenizer.json")
    if os.path.exists(tok):
        shutil.copy(tok, os.path.join(args.output, "tokenizer.json"))
    logging.info("saved converted checkpoint to %s", args.output)


if __name__ == "__main__":
    main()
