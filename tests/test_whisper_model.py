"""Numerical parity of the JAX Whisper vs transformers' torch Whisper.

No pretrained weights are needed: a tiny randomly-initialized HF
WhisperForConditionalGeneration is the oracle; its state_dict is converted
through models/convert.py and the same inputs must produce the same encoder
states and decoder logits. This proves the full compute graph (conv stem,
attention conventions, KV caching, tied logits) end-to-end — with converted
real weights the same graph is the real model.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.models import convert as convert_mod
from whisperlive_tpu.models import whisper as wmod

TINY = dict(
    vocab_size=1000,
    num_mel_bins=80,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=256,
    decoder_ffn_dim=256,
    max_source_positions=96,
    max_target_positions=48,
    # defaults point at the real whisper vocab; keep ids inside the tiny vocab
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=3,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(HFConfig(**TINY)).eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    cfg = convert_mod.config_from_hf(TINY)
    params = convert_mod.params_from_state_dict(hf_model.state_dict(), cfg)
    return cfg, params


def _rand_mel(rng, cfg, b=2):
    # encoder input frames = 2 * max_source_positions (conv2 stride 2)
    t = 2 * cfg.n_audio_ctx
    return rng.standard_normal((b, t, cfg.n_mels)).astype(np.float32)


def test_encoder_parity(rng, hf_model, converted):
    import torch

    cfg, params = converted
    mel = _rand_mel(rng, cfg)
    with torch.no_grad():
        ref = hf_model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    ours = np.asarray(wmod.encode(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decoder_prefill_and_step_parity(rng, hf_model, converted):
    """Prefill + N cached steps must match HF teacher-forced logits."""
    import torch

    cfg, params = converted
    b = 2
    mel = _rand_mel(rng, cfg, b)
    prompt_lens = np.array([3, 5], np.int32)
    total_len = 9
    tokens = rng.integers(0, cfg.n_vocab, (b, total_len)).astype(np.int32)

    # HF oracle: full teacher-forced decode.
    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        )
        ref_logits = out.logits.numpy()  # [B, T, V]

    # Ours: encode once, prefill per-item prompts, then lockstep steps —
    # the cache uses batch-uniform slots, per-item positions live only in
    # the mask/pos-embedding.
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross_kv = wmod.compute_cross_kv(params, cfg, enc)
    self_kv = wmod.init_self_kv(cfg, b)

    pmax = 6
    prompts = np.zeros((b, pmax), np.int32)
    for i, pl in enumerate(prompt_lens):
        prompts[i, :pl] = tokens[i, :pl]
    last_logits, self_kv = wmod.decode_prefill(
        params, cfg, jnp.asarray(prompts), jnp.asarray(prompt_lens), self_kv, cross_kv
    )
    for i, pl in enumerate(prompt_lens):
        np.testing.assert_allclose(
            np.asarray(last_logits)[i], ref_logits[i, pl - 1], atol=2e-3, rtol=1e-3
        )

    # Lockstep autoregressive steps: item i's step-s token is the oracle's
    # ground-truth token at logical position prompt_len[i] + s; compare
    # logits at that position.
    prompt_len_j = jnp.asarray(prompt_lens)
    for s in range(total_len - int(prompt_lens.max()) - 1):
        cur = prompt_lens + s
        tok = jnp.asarray(tokens[np.arange(b), cur])
        logits, self_kv = wmod.decode_step(
            params, cfg, tok, jnp.asarray(cur), jnp.int32(pmax + s),
            prompt_len_j, pmax, self_kv, cross_kv,
        )
        for i in range(b):
            np.testing.assert_allclose(
                np.asarray(logits)[i], ref_logits[i, cur[i]], atol=2e-3, rtol=1e-3
            )


def test_catalog_matches_reference_serving_list():
    """The model-size catalog must cover every name the reference's
    serving backend accepts (faster_whisper_backend.py:74-79), including
    the distil family and the turbo alias."""
    reference_names = [
        "tiny", "tiny.en", "base", "base.en", "small", "small.en",
        "medium", "medium.en", "large-v2", "large-v3", "distil-small.en",
        "distil-medium.en", "distil-large-v2", "distil-large-v3",
        "large-v3-turbo", "turbo",
    ]
    for name in reference_names:
        assert name in wmod.WHISPER_CONFIGS, name
    assert wmod.WHISPER_CONFIGS["turbo"] is wmod.WHISPER_CONFIGS["large-v3-turbo"]
    # distil = teacher encoder + shallow decoder (public model-card facts)
    for name, dec_layers in [
        ("distil-small.en", 4), ("distil-medium.en", 2),
        ("distil-large-v2", 2), ("distil-large-v3", 2),
    ]:
        cfg = wmod.WHISPER_CONFIGS[name]
        assert cfg.n_text_layer == dec_layers, name
        teacher = wmod.WHISPER_CONFIGS[name.removeprefix("distil-")]
        assert cfg.n_audio_layer == teacher.n_audio_layer, name
        assert cfg.n_audio_state == teacher.n_audio_state, name


def test_distil_shaped_decoder_parity(rng):
    """Asymmetric depth (distil family: deep encoder, shallow decoder) must
    ride the same graph — prefill + cached-step logits vs an HF oracle
    built with encoder_layers != decoder_layers."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_kw = dict(TINY, encoder_layers=3, decoder_layers=1)
    torch.manual_seed(1)
    model = WhisperForConditionalGeneration(HFConfig(**hf_kw)).eval()
    cfg = convert_mod.config_from_hf(hf_kw)
    assert cfg.n_audio_layer == 3 and cfg.n_text_layer == 1
    params = convert_mod.params_from_state_dict(model.state_dict(), cfg)

    b = 2
    mel = _rand_mel(rng, cfg, b)
    tokens = rng.integers(0, cfg.n_vocab, (b, 6)).astype(np.int32)
    with torch.no_grad():
        ref_logits = model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()

    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross_kv = wmod.compute_cross_kv(params, cfg, enc)
    self_kv = wmod.init_self_kv(cfg, b)
    pmax = 4
    prompt_lens = jnp.asarray([4, 4])
    last_logits, self_kv = wmod.decode_prefill(
        params, cfg, jnp.asarray(tokens[:, :pmax]), prompt_lens, self_kv, cross_kv
    )
    np.testing.assert_allclose(
        np.asarray(last_logits), ref_logits[:, pmax - 1], atol=2e-3, rtol=1e-3
    )
    logits, self_kv = wmod.decode_step(
        params, cfg, jnp.asarray(tokens[:, pmax]), jnp.asarray([pmax, pmax]),
        jnp.int32(pmax), prompt_lens, pmax, self_kv, cross_kv,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits[:, pmax], atol=2e-3, rtol=1e-3
    )


def test_cross_attn_shapes(rng, converted):
    cfg, params = converted
    mel = _rand_mel(rng, cfg, 1)
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross_kv = wmod.compute_cross_kv(params, cfg, enc)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 7)).astype(np.int32))
    logits, cross = wmod.decode_with_cross_attn(params, cfg, tokens, cross_kv)
    assert logits.shape == (1, 7, cfg.n_vocab)
    assert cross.shape == (cfg.n_text_layer, 1, cfg.n_text_head, 7, cfg.n_audio_ctx)


def test_init_params_structure_matches_convert(hf_model, converted):
    import jax

    cfg, params = converted
    rand = wmod.init_params(cfg)
    ref_tree = jax.tree_util.tree_structure(params)
    rand_tree = jax.tree_util.tree_structure(rand)
    assert ref_tree == rand_tree
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rand)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_int8_cross_kv_close_to_bf16(rng, converted):
    """int8 cross-KV with per-channel scales must track the f32 path."""
    import jax

    from whisperlive_tpu.models import whisper as wmod

    cfg, params = converted
    mel = _rand_mel(rng, cfg, 1)
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross = wmod.compute_cross_kv(params, cfg, enc)
    crossq = wmod.quantize_cross_kv(cross)
    assert crossq["kv8"].dtype == jnp.int8

    kv = wmod.init_self_kv(cfg, 1)
    tok = jnp.asarray([5], jnp.int32)
    pos = jnp.asarray([1], jnp.int32)
    plen = jnp.asarray([1], jnp.int32)
    ref, _ = wmod.decode_step(params, cfg, tok, pos, jnp.int32(4), plen, 4, kv, cross)
    out, _ = wmod.decode_step(params, cfg, tok, pos, jnp.int32(4), plen, 4, kv, crossq)
    ref, out = np.asarray(ref), np.asarray(out)
    # logits track closely in absolute terms and argmax agrees
    assert np.abs(ref - out).max() < 0.1
    assert ref.argmax() == out.argmax()


def test_int8_decoder_weights_close(rng, converted):
    """Weight-only int8 decoder must track the f32 decoder closely."""
    from whisperlive_tpu.models import whisper as wmod

    cfg, params = converted
    q = wmod.quantize_decoder_weights(params)
    assert q["decoder"]["layers"]["attn"]["q"]["w8"].dtype == jnp.int8

    mel = _rand_mel(rng, cfg, 1)
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross_ref = wmod.compute_cross_kv(params, cfg, enc)
    cross_q = wmod.compute_cross_kv(q, cfg, enc)

    kv = wmod.init_self_kv(cfg, 1)
    prompts = jnp.asarray([[3, 7, 9, 0]], jnp.int32)
    plen = jnp.asarray([3], jnp.int32)
    ref, _ = wmod.decode_prefill(params, cfg, prompts, plen, kv, cross_ref)
    out, _ = wmod.decode_prefill(q, cfg, prompts, plen, kv, cross_q)
    ref, out = np.asarray(ref), np.asarray(out)
    assert np.abs(ref - out).max() < 0.15
    assert ref.argmax() == out.argmax()


def test_int4_cross_kv_tracks_f32(rng, converted):
    """Packed int4 cross-KV (jnp unpack path) must track the f32 path
    closely enough to preserve the argmax on a tiny model."""
    from whisperlive_tpu.models import whisper as wmod
    from whisperlive_tpu.ops.attention import pack_int4, unpack_int4

    # pack/unpack round trip
    vals = np.arange(-8, 8, dtype=np.int8).reshape(2, 8)
    packed = np.asarray(pack_int4(jnp.asarray(vals)))
    assert packed.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(unpack_int4(jnp.asarray(packed))), vals)

    cfg, params = converted
    mel = _rand_mel(rng, cfg, 1)
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross = wmod.compute_cross_kv(params, cfg, enc)
    cross4 = wmod.quantize_cross_kv_int4(cross)
    assert cross4["kv4"].shape[-1] == cfg.head_dim // 2

    kv = wmod.init_self_kv(cfg, 1)
    tok = jnp.asarray([5], jnp.int32)
    pos = jnp.asarray([1], jnp.int32)
    plen = jnp.asarray([1], jnp.int32)
    ref, _ = wmod.decode_step(params, cfg, tok, pos, jnp.int32(4), plen, 4, kv, cross)
    out, _ = wmod.decode_step(params, cfg, tok, pos, jnp.int32(4), plen, 4, kv, cross4)
    ref, out = np.asarray(ref), np.asarray(out)
    assert np.abs(ref - out).max() < 0.3
    assert ref.argmax() == out.argmax()


def test_engine_int8_cross_split_path(rng):
    """The ENGINE-level split path (prepare -> detect/decode_batch ->
    align_words) must handle the int8 cross-KV dict — the TPU-default
    layout {kv8, scale} that CPU's f32 default never exercises. Regression:
    decode_batch read only the "kv"/"kv4" keys and crashed on kv8 at
    server warmup."""
    from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
    from whisperlive_tpu.models.whisper import WhisperConfig, init_params
    from whisperlive_tpu.ops.mel import N_SAMPLES

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    eng = WhisperEngine(cfg, init_params(cfg, 0), compute_dtype=jnp.float32,
                        batch_buckets=(1,), cross_kv_bits=8)
    audio = (np.random.default_rng(3).standard_normal(32000) * 0.1).astype(np.float32)
    buf = np.zeros((1, N_SAMPLES), np.float32)
    buf[0, : len(audio)] = audio
    _, cross = eng.prepare(buf)
    assert "kv8" in cross
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=12,
    )
    p, s = eng.build_prompt(opts, language="en")
    (res,) = eng.decode_batch(cross, [p], [s], opts)
    assert len(res.tokens) > 0
    eng.detect_language_from_cross(cross)
    words = eng.align_words(cross, 0, [t for t in res.tokens][:8], 200)
    assert isinstance(words, list)


def test_encoder_reduced_context_parity(rng, hf_model, converted):
    """Short-window encoding (streaming tails skip most of the 30 s
    padding) must match an HF Whisper whose max_source_positions is cut to
    the same length — the VALIDATION that slicing the position embedding
    is the correct reduced-context semantics."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    cfg, params = converted
    t_short = cfg.n_audio_ctx // 2  # 48 of 96 positions
    short_cfg = dict(TINY, max_source_positions=t_short)
    hf_short = WhisperForConditionalGeneration(HFConfig(**short_cfg)).eval()
    sd = {k: v.clone() for k, v in hf_model.state_dict().items()}
    sd["model.encoder.embed_positions.weight"] = sd[
        "model.encoder.embed_positions.weight"
    ][:t_short]
    hf_short.load_state_dict(sd)

    mel = _rand_mel(rng, cfg)[:, : 2 * t_short]
    with torch.no_grad():
        ref = hf_short.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    ours = np.asarray(wmod.encode(params, cfg, jnp.asarray(mel)))
    assert ours.shape == (mel.shape[0], t_short, cfg.n_audio_state)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decode_window_parity(rng, hf_model, converted):
    """decode_window (the speculative verify primitive) must match HF
    teacher-forced logits at EVERY window position, with mixed per-item
    prompt lengths — and a second window that starts mid-way through the
    first one's slots must still match, proving the mask-based
    no-rollback semantics (stale rejected K/V is overwritten/masked)."""
    import torch

    cfg, params = converted
    b = 2
    mel = _rand_mel(rng, cfg, b)
    prompt_lens = np.array([3, 5], np.int32)
    total_len = 16
    tokens = rng.integers(0, cfg.n_vocab, (b, total_len)).astype(np.int32)

    with torch.no_grad():
        ref_logits = hf_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()

    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    cross_kv = wmod.compute_cross_kv(params, cfg, enc)
    self_kv = wmod.init_self_kv(cfg, b)

    pmax = 6
    prompts = np.zeros((b, pmax), np.int32)
    for i, pl in enumerate(prompt_lens):
        prompts[i, :pl] = tokens[i, :pl]
    prompt_len_j = jnp.asarray(prompt_lens)
    _, self_kv = wmod.decode_prefill(
        params, cfg, jnp.asarray(prompts), prompt_len_j, self_kv, cross_kv
    )

    # Window 1: K tokens at logical positions prompt_len..prompt_len+K-1.
    # Positions 0..a keep the ground-truth tokens ("accepted"); positions
    # a+1.. carry GARBAGE ("rejected drafts") whose K/V lands in the cache.
    K, a = 4, 1
    idx = np.arange(b)[:, None]
    pos1 = prompt_lens[:, None] + np.arange(K)
    win1 = tokens[idx, pos1].copy()
    win1[:, a + 1:] = 1 + (win1[:, a + 1:] % (cfg.n_vocab - 1))  # corrupt
    logits1, self_kv = wmod.decode_window(
        params, cfg, jnp.asarray(win1), jnp.asarray(pos1), jnp.int32(pmax),
        prompt_len_j, pmax, self_kv, cross_kv,
    )
    # positions up to the corruption see only clean history -> must match
    for i in range(b):
        # logits index j is emitted after consuming window token j, so
        # only indices up to the last clean token (j <= a) match the oracle
        for j in range(a + 1):
            np.testing.assert_allclose(
                np.asarray(logits1)[i, j], ref_logits[i, pos1[i, j]],
                atol=2e-3, rtol=1e-3,
            )

    # Window 2 starts at slot pmax+a+1 (the speculative continuation
    # pattern): the garbage K/V from window 1 sits at slots >= slot_start
    # and must be overwritten/masked away.
    pos2 = prompt_lens[:, None] + (a + 1) + np.arange(K)
    win2 = tokens[idx, pos2]
    logits2, self_kv = wmod.decode_window(
        params, cfg, jnp.asarray(win2), jnp.asarray(pos2),
        jnp.int32(pmax + a + 1), prompt_len_j, pmax, self_kv, cross_kv,
    )
    for i in range(b):
        for j in range(K):
            np.testing.assert_allclose(
                np.asarray(logits2)[i, j], ref_logits[i, pos2[i, j]],
                atol=2e-3, rtol=1e-3,
            )


def test_dequantize_decoder_roundtrip(rng, converted):
    """dequantize_decoder_weights rebuilds dense weights carrying EXACTLY
    the int8-dequant values (w8 * s) the serving kernels compute with, so
    training-path forwards (distillation) can match serving numerics."""
    from whisperlive_tpu.models import whisper as wmod
    from whisperlive_tpu.training import decoder_forward_train

    cfg, params = converted
    q = wmod.quantize_decoder_weights(params)
    dq = wmod.dequantize_decoder_weights(q)

    # exact reconstruction of the dequantized values
    lw = q["decoder"]["layers"]["attn"]["q"]
    want = np.asarray(lw["w8"], np.float32) * np.asarray(
        lw["s"], np.float32
    )[..., None, :]
    np.testing.assert_array_equal(
        np.asarray(dq["decoder"]["layers"]["attn"]["q"]["w"]), want
    )
    assert "embed" in dq["decoder"] and "embed8" not in dq["decoder"]
    # idempotent on an unquantized tree
    assert wmod.dequantize_decoder_weights(params) is params

    # the training-path forward over the dequantized tree tracks the
    # quantized serving decoder: logits close to the f32 tree's (same
    # bound as the int8 serving test) and a usable teacher for KD
    mel = _rand_mel(rng, cfg, 1)
    enc = wmod.encode(params, cfg, jnp.asarray(mel))
    tok = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 8)), jnp.int32)
    ref = np.asarray(decoder_forward_train(params, cfg, tok, enc))
    out = np.asarray(decoder_forward_train(dq, cfg, tok, enc))
    assert np.abs(ref - out).max() < 0.15
