"""Multi-device sharding on the virtual 8-CPU mesh: TP-sharded inference
matches single-device output; DP+TP training step runs and reduces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlive_tpu.models.whisper import WhisperConfig, init_params
from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.parallel.mesh import EngineShardings, make_mesh

CFG = WhisperConfig(
    n_mels=80, n_vocab=512, n_audio_ctx=32, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=16, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


def test_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(tp=3)


def test_param_sharding_specs():
    sh = EngineShardings.create(tp=2)
    params = init_params(CFG)
    specs = sh.param_shardings(params)
    # attention q weight sharded on output dim
    q = specs["encoder"]["layers"]["attn"]["q"]["w"].spec
    assert q[-1] == "model" and q[-2] is None
    # output proj sharded on input dim
    o = specs["encoder"]["layers"]["attn"]["o"]["w"].spec
    assert o[-2] == "model" and o[-1] is None
    # fc2 sharded on input dim, embed replicated
    fc2 = specs["decoder"]["layers"]["mlp"]["fc2"]["w"].spec
    assert fc2[-2] == "model"
    emb = specs["decoder"]["embed"].spec
    assert all(s is None for s in emb)


def test_tp_encode_matches_single_device(rng):
    params = init_params(CFG, seed=1)
    mel = jnp.asarray(
        rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels)), jnp.float32
    )
    ref = np.asarray(wmod.encode(params, CFG, mel))

    sh = EngineShardings.create(tp=2)
    sh.validate(CFG)
    sharded = jax.device_put(params, sh.param_shardings(params))
    out = np.asarray(jax.jit(lambda p, m: wmod.encode(p, CFG, m))(sharded, mel))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_tp_decode_step_matches_single_device(rng):
    params = init_params(CFG, seed=1)
    mel = jnp.asarray(
        rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels)), jnp.float32
    )
    enc = wmod.encode(params, CFG, mel)
    cross = wmod.compute_cross_kv(params, CFG, enc)
    kv = wmod.init_self_kv(CFG, 2)
    tok = jnp.asarray([3, 5], jnp.int32)
    pos = jnp.asarray([2, 2], jnp.int32)
    plen = jnp.asarray([2, 2], jnp.int32)
    slot = jnp.int32(4)
    ref_logits, _ = wmod.decode_step(params, CFG, tok, pos, slot, plen, 4, kv, cross)

    sh = EngineShardings.create(tp=2)
    sp = jax.device_put(params, sh.param_shardings(params))

    def f(p, m, tok, pos):
        enc = wmod.encode(p, CFG, m)
        cross = wmod.compute_cross_kv(p, CFG, enc)
        kv = wmod.init_self_kv(CFG, 2)
        return wmod.decode_step(p, CFG, tok, pos, slot, plen, 4, kv, cross)[0]

    out = np.asarray(jax.jit(f)(sp, mel, tok, pos))
    np.testing.assert_allclose(out, np.asarray(ref_logits), atol=2e-4, rtol=1e-4)


def test_train_step_dp_tp(rng):
    from whisperlive_tpu import training

    sh = EngineShardings.create(tp=2)
    # warmup=1 so the learning rate is live by the second step
    opt = training.make_optimizer(learning_rate=1e-3, warmup_steps=1)
    params = init_params(CFG, seed=0)
    params = jax.device_put(params, sh.param_shardings(params))
    opt_state = jax.jit(opt.init)(params)
    state = training.TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    b = 8
    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((b, 2 * CFG.n_audio_ctx, CFG.n_mels)), jnp.float32
        ),
        "tokens_in": jnp.asarray(rng.integers(0, 512, (b, 8)), jnp.int32),
        "tokens_out": jnp.asarray(rng.integers(0, 512, (b, 8)), jnp.int32),
        "loss_mask": jnp.ones((b, 8), jnp.float32),
    }
    batch = {k: jax.device_put(v, sh.batch_sharding(v.ndim)) for k, v in batch.items()}
    step = jax.jit(training.make_train_step(CFG, opt), donate_argnums=0)
    state1, loss1 = step(state, batch)
    loss1 = float(loss1)
    for _ in range(3):
        state1, loss_last = step(state1, batch)
    assert np.isfinite(loss1) and np.isfinite(float(loss_last))
    assert float(loss_last) < loss1  # optimizer actually moves params
    assert int(state1.step) == 4


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    dryrun_multichip(4)


def test_engine_with_tp_shardings_end_to_end(rng):
    """WhisperEngine(--tp path): sharded params through prepare/detect/
    decode produce the same tokens as the unsharded engine."""
    from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
    from whisperlive_tpu.ops.mel import N_SAMPLES

    cfg = WhisperConfig(
        n_mels=80, n_vocab=51865, n_audio_ctx=50, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=64, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, seed=0)
    opts = TranscribeOptions(
        language="en", temperatures=(0.0,), log_prob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        max_new_tokens=8,
    )

    def run(engine):
        mel = rng0.standard_normal((1, 2 * cfg.n_audio_ctx, 80)).astype(np.float32)
        _, cross = engine.prepare_mel(jnp.asarray(mel))
        p, s = engine.build_prompt(opts)
        (res,) = engine.decode_batch(cross, [p], [s], opts, seed=3)
        return res

    rng0 = np.random.default_rng(7)
    base = run(WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                             batch_buckets=(1,), prompt_buckets=(8,)))
    rng0 = np.random.default_rng(7)
    sh = EngineShardings.create(tp=2)
    sharded = run(WhisperEngine(cfg, params, compute_dtype=jnp.float32,
                                batch_buckets=(1,), prompt_buckets=(8,),
                                shardings=sh))
    np.testing.assert_array_equal(base.tokens, sharded.tokens)
    assert base.avg_logprob == pytest.approx(sharded.avg_logprob, abs=1e-4)
