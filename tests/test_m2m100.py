"""JAX M2M100 parity vs transformers' torch implementation (random tiny)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.models import m2m100 as m2m

TINY = dict(
    vocab_size=512,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_position_embeddings=64,
    pad_token_id=1,
    bos_token_id=0,
    eos_token_id=2,
    decoder_start_token_id=2,
    scale_embedding=True,
    activation_function="relu",
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import M2M100Config as HFConfig
    from transformers import M2M100ForConditionalGeneration

    torch.manual_seed(0)
    return M2M100ForConditionalGeneration(HFConfig(**TINY)).eval()


@pytest.fixture(scope="module")
def converted(hf_model):
    cfg = m2m.config_from_hf(TINY)
    return cfg, m2m.params_from_state_dict(hf_model.state_dict(), cfg)


def test_encoder_parity(rng, hf_model, converted):
    import torch

    cfg, params = converted
    tokens = rng.integers(3, cfg.vocab_size, (2, 9)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model.model.encoder(
            torch.from_numpy(tokens.astype(np.int64))
        ).last_hidden_state.numpy()
    ours = np.asarray(m2m.encode(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decoder_logits_parity(rng, hf_model, converted):
    import torch

    cfg, params = converted
    src = rng.integers(3, cfg.vocab_size, (2, 7)).astype(np.int32)
    tgt = rng.integers(3, cfg.vocab_size, (2, 5)).astype(np.int32)
    tgt[:, 0] = cfg.eos_token_id  # decoder start
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(src.astype(np.int64)),
            decoder_input_ids=torch.from_numpy(tgt.astype(np.int64)),
        ).logits.numpy()
    enc = m2m.encode(params, cfg, jnp.asarray(src))
    ours = np.asarray(m2m.decode(params, cfg, jnp.asarray(tgt), enc))
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-3)


def test_greedy_matches_hf_generate(rng, hf_model, converted):
    import torch

    cfg, params = converted
    src = rng.integers(3, cfg.vocab_size, (1, 6)).astype(np.int32)
    forced = 10
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(src.astype(np.int64)),
            forced_bos_token_id=forced,
            max_new_tokens=8,
            num_beams=1,
            do_sample=False,
        ).numpy()[0]
    ours = np.asarray(
        m2m.generate_greedy(
            params, cfg, jnp.asarray(src), jnp.asarray([forced]), max_new=8
        )
    )[0]
    # HF output = [eos, forced, tokens...]; ours = [tokens...]
    ref_tail = ref[2:]
    n = min(len(ref_tail), len(ours))
    np.testing.assert_array_equal(ours[:n], ref_tail[:n])


def test_beam_matches_hf_generate(rng, hf_model, converted):
    """generate_beam must reproduce HF generate(num_beams=K,
    early_stopping=True) token-for-token — the reference translates with
    M2M100's generation-config defaults (num_beams=5, early_stopping),
    not greedy (translation_backend.py:92 calls bare generate())."""
    import torch

    cfg, params = converted
    tokens = rng.integers(3, cfg.vocab_size, (2, 7)).astype(np.int32)
    max_new = 16
    k = 3
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(tokens.astype(np.int64)),
            num_beams=k,
            early_stopping=True,
            length_penalty=1.0,
            max_new_tokens=max_new,
            forced_bos_token_id=None,
            do_sample=False,
        ).numpy()
    ours = np.asarray(
        m2m.generate_beam(
            params, cfg, jnp.asarray(tokens), None, max_new=max_new,
            beam_size=k,
        )
    )
    pad = cfg.pad_token_id
    for i in range(tokens.shape[0]):
        # HF output: [decoder_start, generated..., eos, pad...]; ours is
        # the generated region only
        ref_gen = [int(t) for t in ref[i, 1:] if t != pad]
        our_gen = [int(t) for t in ours[i] if t != pad]
        assert our_gen == ref_gen, (i, our_gen, ref_gen)
