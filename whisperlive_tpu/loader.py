"""Model resolution shared by CLIs and scripts: a size name or a
checkpoint dir -> (cfg, params, tokenizer) or a built WhisperEngine.

One copy of the checkpoint-format detection (HF safetensors vs converted
orbax dir), tokenizer.json pickup, and the random-init fallback — the
server CLI, the offline transcription CLI, and the distillation script
all load through here (previously three near-identical blocks)."""

from __future__ import annotations

import logging
import os
from typing import Any

logger = logging.getLogger(__name__)


def resolve_model(size: str, ckpt: str | None, param_dtype: Any = None):
    """-> (cfg, params, tokenizer|None). `ckpt` (HF or converted dir)
    wins over `size`; without one, params are RANDOM at `size`'s shape
    (param_dtype defaults to bf16 on TPU, f32 elsewhere)."""
    from whisperlive_tpu.models import convert as convert_mod
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params

    tokenizer = None
    if ckpt:
        ckpt = os.path.expanduser(ckpt)
        if os.path.exists(os.path.join(ckpt, "model.safetensors")) or os.path.exists(
            os.path.join(ckpt, "model.safetensors.index.json")
        ):
            cfg, params = convert_mod.load_hf_checkpoint(ckpt)
        else:
            cfg, params = convert_mod.load_converted(ckpt)
        tok_file = os.path.join(ckpt, "tokenizer.json")
        if os.path.exists(tok_file):
            from whisperlive_tpu.engine.tokenizer import WhisperTokenizer

            tokenizer = WhisperTokenizer.from_files(
                cfg.n_vocab, tok_file, multilingual=cfg.n_vocab >= 51865
            )
        return cfg, params, tokenizer

    import jax
    import jax.numpy as jnp

    if size not in WHISPER_CONFIGS:
        raise SystemExit(f"unknown model size {size!r}")
    cfg = WHISPER_CONFIGS[size]
    logger.warning(
        "no checkpoint for %s — initializing RANDOM weights (pass a "
        "converted/HF checkpoint dir for real output)", size,
    )
    if param_dtype is None:
        param_dtype = (
            jnp.bfloat16 if jax.default_backend() in ("tpu", "axon")
            else jnp.float32
        )
    return cfg, init_params(cfg, dtype=param_dtype), None


def load_engine(
    size: str,
    ckpt: str | None,
    compute_dtype: Any = None,
    decoder_int8: bool | None = None,
    shardings: Any = None,
):
    """resolve_model + WhisperEngine. decoder_int8=False matters for
    training/distillation consumers — the serving default quantizes the
    decoder on TPU, which strips the raw weight tensors."""
    from whisperlive_tpu.engine.engine import WhisperEngine

    cfg, params, tokenizer = resolve_model(size, ckpt)
    return WhisperEngine(
        cfg, params, tokenizer=tokenizer, compute_dtype=compute_dtype,
        decoder_int8=decoder_int8, shardings=shardings,
    )


def draft_distill_ctx(ckpt: str | None) -> int | None:
    """The `distill_enc_ctx` a draft checkpoint was trained at (None when
    unknown). A draft only agrees with its target at the encoder context
    it was distilled at — the encoder output is a different function of
    the same audio per position count (measured 0.985 -> 0.34 argmax
    agreement on random weights, BENCH_NOTES round 4) — so serving layers
    warn when deploying a draft at a different context."""
    import json

    if not ckpt:
        return None
    path = os.path.join(os.path.expanduser(ckpt), "config.json")
    try:
        with open(path) as f:
            return json.load(f).get("distill_enc_ctx")
    except (OSError, ValueError):
        return None
