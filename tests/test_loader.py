"""Shared model loader: size resolution, checkpoint round-trip, engine
construction knobs (the single copy run_server / the transcribe CLI /
distill_draft all load through)."""

import numpy as np
import pytest

from whisperlive_tpu.loader import load_engine, resolve_model
from whisperlive_tpu.models import convert as convert_mod
from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, WhisperConfig


def test_unknown_size_rejected():
    with pytest.raises(SystemExit, match="unknown model size"):
        resolve_model("not-a-size", None)


def test_random_init_by_size():
    import jax.numpy as jnp

    cfg, params, tok = resolve_model("tiny", None, param_dtype=jnp.float32)
    assert cfg is WHISPER_CONFIGS["tiny"]
    assert tok is None
    assert params["decoder"]["embed"].shape == (cfg.n_vocab, cfg.n_text_state)


def test_converted_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    cfg = WhisperConfig(
        n_mels=80, n_vocab=256, n_audio_ctx=64, n_audio_state=32,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=32, n_text_state=32,
        n_text_head=2, n_text_layer=1,
    )
    from whisperlive_tpu.models.whisper import init_params

    params = init_params(cfg, 0)
    convert_mod.save_converted(str(tmp_path / "ckpt"), cfg, params)

    cfg2, params2, tok = resolve_model("ignored", str(tmp_path / "ckpt"))
    assert tok is None
    assert cfg2.n_text_layer == cfg.n_text_layer
    np.testing.assert_array_equal(
        np.asarray(params2["decoder"]["embed"]),
        np.asarray(params["decoder"]["embed"]),
    )

    # decoder_int8=False keeps the raw weights (the distillation path)
    eng = load_engine("ignored", str(tmp_path / "ckpt"),
                      compute_dtype=jnp.float32, decoder_int8=False)
    assert "embed" in eng.params["decoder"]
    eng8 = load_engine("ignored", str(tmp_path / "ckpt"),
                       compute_dtype=jnp.float32, decoder_int8=True)
    assert "embed8" in eng8.params["decoder"]
