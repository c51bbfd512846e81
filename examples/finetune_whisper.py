#!/usr/bin/env python
"""Fine-tune Whisper on a TPU mesh (capability the reference lacks).

Demonstrates the training path: converted HF checkpoint -> DP+TP mesh ->
jitted train step -> orbax checkpoint. Data pipeline is a stub; plug in your
(audio, transcript) pairs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from whisperlive_tpu import training
from whisperlive_tpu.engine.tokenizer import TokenSpec, WhisperTokenizer
from whisperlive_tpu.models.whisper import WHISPER_CONFIGS, init_params
from whisperlive_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from whisperlive_tpu.parallel import multihost
from whisperlive_tpu.parallel.mesh import EngineShardings


def make_batch(tokenizer, cfg, audio_batch, texts, max_len=128):
    """(audio, text) pairs -> teacher-forcing batch."""
    mel = log_mel_spectrogram(jnp.asarray(audio_batch), n_mels=cfg.n_mels)
    b = len(texts)
    tokens_in = np.zeros((b, max_len), np.int32)
    tokens_out = np.zeros((b, max_len), np.int32)
    mask = np.zeros((b, max_len), np.float32)
    for i, text in enumerate(texts):
        seq = tokenizer.sot_sequence(include_timestamps=False)
        seq += tokenizer.encode(text) + [tokenizer.eot]
        seq = seq[: max_len + 1]
        tokens_in[i, : len(seq) - 1] = seq[:-1]
        tokens_out[i, : len(seq) - 1] = seq[1:]
        mask[i, len(tokenizer.sot_sequence(include_timestamps=False)) - 1 : len(seq) - 1] = 1.0
    return {
        "mel": mel,
        "tokens_in": jnp.asarray(tokens_in),
        "tokens_out": jnp.asarray(tokens_out),
        "loss_mask": jnp.asarray(mask),
    }


def main() -> None:
    # multi-host: run this same script on every host with WL_COORDINATOR /
    # WL_NUM_PROCS / WL_PROC_ID set — dp then spans hosts (gradients
    # all-reduce over DCN) while tp stays on each host's ICI, and each
    # host feeds its own shard via multihost.local_batch_to_global
    multihost.init_multihost()
    cfg = WHISPER_CONFIGS["tiny"]
    tokenizer = WhisperTokenizer(TokenSpec(cfg.n_vocab, multilingual=True), language="en")

    n = len(jax.devices())
    shardings = multihost.multihost_shardings(tp=2 if n % 2 == 0 else 1)
    optimizer = training.make_optimizer(learning_rate=1e-5, warmup_steps=10)
    params = init_params(cfg)  # or convert.load_hf_checkpoint(...)[1]
    params = jax.device_put(params, shardings.param_shardings(params))
    state = training.TrainState(params, jax.jit(optimizer.init)(params), jnp.zeros((), jnp.int32))
    step = jax.jit(training.make_train_step(cfg, optimizer), donate_argnums=0)

    rng = np.random.default_rng(0)
    nproc = jax.process_count()
    local_b = shardings.dp * 2 // nproc  # this host's share of the batch
    for i in range(5):  # replace with a real data loader
        audio = rng.standard_normal((local_b, N_SAMPLES)).astype(np.float32) * 0.1
        texts = ["hello world"] * local_b
        batch = make_batch(tokenizer, cfg, audio, texts)
        if nproc > 1:
            batch = {
                k: multihost.local_batch_to_global(
                    np.asarray(v), shardings.batch_sharding(np.ndim(v))
                )
                for k, v in batch.items()
            }
        else:
            batch = {k: jax.device_put(v, shardings.batch_sharding(v.ndim)) for k, v in batch.items()}
        state, loss = step(state, batch)
        if multihost.is_primary():
            print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
