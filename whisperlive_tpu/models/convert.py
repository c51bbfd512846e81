"""HF Whisper checkpoint -> whisperlive_tpu parameter pytree.

The TPU analogue of the reference's model-artifact pipeline (HF snapshot
download + CTranslate2 conversion cache, faster_whisper_backend.py:133-178):
a one-time conversion from `transformers` Whisper checkpoints (safetensors
or an in-memory state_dict) to our stacked-layer functional pytree, plus an
orbax checkpoint cache so later server starts skip conversion.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from whisperlive_tpu.models.whisper import Params, WhisperConfig, sinusoids

logger = logging.getLogger(__name__)


def config_from_hf(hf_config: Mapping[str, Any]) -> WhisperConfig:
    """Map transformers WhisperConfig fields to our architecture config."""
    return WhisperConfig(
        n_mels=hf_config["num_mel_bins"],
        n_vocab=hf_config["vocab_size"],
        n_audio_ctx=hf_config.get("max_source_positions", 1500),
        n_audio_state=hf_config["d_model"],
        n_audio_head=hf_config["encoder_attention_heads"],
        n_audio_layer=hf_config["encoder_layers"],
        n_text_ctx=hf_config.get("max_target_positions", 448),
        n_text_state=hf_config["d_model"],
        n_text_head=hf_config["decoder_attention_heads"],
        n_text_layer=hf_config["decoder_layers"],
    )


def _t(x) -> np.ndarray:
    """torch tensor / np array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _attn_params(sd: Mapping[str, Any], prefix: str, k_bias: bool = False) -> Params:
    """One HF-transformer attention block. k_bias=False is the Whisper
    convention (no key-projection bias); M2M100 sets True. Shared by
    models/m2m100.py — keep the two converters from drifting."""
    k = {"w": _t(sd[f"{prefix}.k_proj.weight"]).T}
    if k_bias:
        k["b"] = _t(sd[f"{prefix}.k_proj.bias"])
    p = {
        "q": {"w": _t(sd[f"{prefix}.q_proj.weight"]).T, "b": _t(sd[f"{prefix}.q_proj.bias"])},
        "k": k,
        "v": {"w": _t(sd[f"{prefix}.v_proj.weight"]).T, "b": _t(sd[f"{prefix}.v_proj.bias"])},
        "o": {"w": _t(sd[f"{prefix}.out_proj.weight"]).T, "b": _t(sd[f"{prefix}.out_proj.bias"])},
    }
    return p


def _ln_params(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _block_params(sd, prefix: str, cross: bool, k_bias: bool = False) -> Params:
    p = {
        "attn": _attn_params(sd, f"{prefix}.self_attn", k_bias),
        "attn_ln": _ln_params(sd, f"{prefix}.self_attn_layer_norm"),
        "mlp": {
            "fc1": {"w": _t(sd[f"{prefix}.fc1.weight"]).T, "b": _t(sd[f"{prefix}.fc1.bias"])},
            "fc2": {"w": _t(sd[f"{prefix}.fc2.weight"]).T, "b": _t(sd[f"{prefix}.fc2.bias"])},
        },
        "mlp_ln": _ln_params(sd, f"{prefix}.final_layer_norm"),
    }
    if cross:
        p["cross_attn"] = _attn_params(sd, f"{prefix}.encoder_attn", k_bias)
        p["cross_attn_ln"] = _ln_params(sd, f"{prefix}.encoder_attn_layer_norm")
    return p


def _stack(blocks: list[Params]) -> Params:
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks)


def params_from_state_dict(
    state_dict: Mapping[str, Any], cfg: WhisperConfig
) -> Params:
    """Convert a transformers WhisperForConditionalGeneration state_dict.

    Accepts both `model.encoder...`-prefixed (ForConditionalGeneration) and
    bare `encoder...` keys (WhisperModel).
    """
    sd = dict(state_dict)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_blocks = [
        _block_params(sd, f"encoder.layers.{i}", cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _block_params(sd, f"decoder.layers.{i}", cross=True)
        for i in range(cfg.n_text_layer)
    ]
    if "encoder.embed_positions.weight" in sd:
        enc_pos = _t(sd["encoder.embed_positions.weight"])
    else:  # sinusoidal, some checkpoints omit it
        enc_pos = sinusoids(cfg.n_audio_ctx, cfg.n_audio_state)

    return {
        "encoder": {
            "conv1": {
                "w": jnp.asarray(_t(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv1.bias"])),
            },
            "conv2": {
                "w": jnp.asarray(_t(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.conv2.bias"])),
            },
            "pos": jnp.asarray(enc_pos),
            "layers": _stack(enc_blocks),
            "ln_post": {
                "scale": jnp.asarray(_t(sd["encoder.layer_norm.weight"])),
                "bias": jnp.asarray(_t(sd["encoder.layer_norm.bias"])),
            },
        },
        "decoder": {
            "embed": jnp.asarray(_t(sd["decoder.embed_tokens.weight"])),
            "pos": jnp.asarray(_t(sd["decoder.embed_positions.weight"])),
            "layers": _stack(dec_blocks),
            "ln": {
                "scale": jnp.asarray(_t(sd["decoder.layer_norm.weight"])),
                "bias": jnp.asarray(_t(sd["decoder.layer_norm.bias"])),
            },
        },
    }


def load_hf_checkpoint(model_dir: str) -> tuple[WhisperConfig, Params]:
    """Load an on-disk HF Whisper checkpoint directory (config + safetensors)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)

    import safetensors.numpy

    sd: dict[str, np.ndarray] = {}
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        for shard in sorted(set(index["weight_map"].values())):
            sd.update(safetensors.numpy.load_file(os.path.join(model_dir, shard)))
    else:
        sd = safetensors.numpy.load_file(os.path.join(model_dir, "model.safetensors"))
    return cfg, params_from_state_dict(sd, cfg)


# --------------------------------------------------------------------------
# Orbax checkpoint cache (converted-params analogue of the reference's
# CTranslate2 conversion cache dir)
# --------------------------------------------------------------------------


def save_converted(
    path: str, cfg: WhisperConfig, params: Params, extra_meta: dict | None = None
) -> None:
    """extra_meta rides in config.json under keys WhisperConfig ignores on
    load (load_converted filters to config fields) — e.g. a distilled
    draft records `distill_enc_ctx` so serving can warn when a draft is
    deployed at a different encoder context than it was trained for."""
    import dataclasses

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "params"), params, force=True)
    meta = {k: v for k, v in dataclasses.asdict(cfg).items() if k != "dtype"}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f)


def load_converted(path: str) -> tuple[WhisperConfig, Params]:
    import orbax.checkpoint as ocp

    import dataclasses

    path = os.path.abspath(path)
    fields = {f.name for f in dataclasses.fields(WhisperConfig)}
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cfg = WhisperConfig(**{k: v for k, v in meta.items() if k in fields})
    ckpt = ocp.PyTreeCheckpointer()
    params = ckpt.restore(os.path.join(path, "params"))
    return cfg, params
