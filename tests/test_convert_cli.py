"""File-based checkpoint pipeline: HF save_pretrained dir -> load/convert ->
orbax cache -> server-style reload (the production model entry path)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(1)
    cfg = HFConfig(
        vocab_size=800, num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256, max_source_positions=64,
        max_target_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=3,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "whisper-test"
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_load_hf_checkpoint_from_disk(hf_dir, rng):
    import torch

    from whisperlive_tpu.models import convert as convert_mod
    from whisperlive_tpu.models import whisper as wmod

    path, model = hf_dir
    cfg, params = convert_mod.load_hf_checkpoint(path)
    assert cfg.n_audio_state == 64 and cfg.n_vocab == 800

    mel = rng.standard_normal((1, 2 * cfg.n_audio_ctx, 80)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    ours = np.asarray(wmod.encode(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_convert_cli_end_to_end(hf_dir, tmp_path):
    """python -m whisperlive_tpu.cli.convert <hf_dir> -o <out> --verify,
    then reload the cache the way run_server.py does."""
    from whisperlive_tpu.cli.convert import main as convert_main
    from whisperlive_tpu.models import convert as convert_mod

    path, _ = hf_dir
    out = str(tmp_path / "converted")
    convert_main([path, "--output", out, "--verify"])

    cfg, params = convert_mod.load_converted(out)
    assert cfg.n_vocab == 800
    import jax

    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(params))
