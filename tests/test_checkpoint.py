"""Checkpoint round-trips: converted-model cache and training state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlive_tpu.models import convert as convert_mod
from whisperlive_tpu.models.whisper import WhisperConfig, init_params

CFG = WhisperConfig(
    n_mels=80, n_vocab=600, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=16, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)


def test_converted_checkpoint_round_trip(tmp_path):
    params = init_params(CFG, seed=3)
    convert_mod.save_converted(str(tmp_path / "ck"), CFG, params)
    cfg2, params2 = convert_mod.load_converted(str(tmp_path / "ck"))
    assert cfg2.n_audio_state == CFG.n_audio_state
    assert cfg2.n_vocab == CFG.n_vocab
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_checkpoint_round_trip(tmp_path, rng):
    from whisperlive_tpu import training

    opt = training.make_optimizer(learning_rate=1e-3, warmup_steps=1)
    state = training.init_train_state(CFG, opt, seed=0)
    step = jax.jit(training.make_train_step(CFG, opt))
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, 32, 80)), jnp.float32),
        "tokens_in": jnp.asarray(rng.integers(0, 600, (2, 6)), jnp.int32),
        "tokens_out": jnp.asarray(rng.integers(0, 600, (2, 6)), jnp.int32),
        "loss_mask": jnp.ones((2, 6), jnp.float32),
    }
    state, _ = step(state, batch)
    state, loss_before = step(state, batch)

    training.save_checkpoint(str(tmp_path / "t"), state, CFG)
    restored, cfg2 = training.load_checkpoint(str(tmp_path / "t"), opt)
    assert int(restored.step) == int(state.step) == 2
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume training deterministically: one more step from both states
    s1, l1 = step(state, batch)
    s2, l2 = step(restored, batch)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
