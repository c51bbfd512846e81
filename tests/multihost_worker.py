"""Subprocess worker for tests/test_multihost.py — one REAL process of a
multi-host training job (jax.distributed over localhost, gloo-backed CPU
collectives). Each worker owns 4 virtual devices; the global mesh spans
every worker, dp crossing processes (the DCN axis) and tp staying inside
one process (the ICI rule multihost_shardings enforces)."""

import json
import os
import sys


def make_global_batch(cfg, step_i: int, b: int):
    """Deterministic global batch — identical on every host; each host
    feeds only its slice (multihost.local_batch_to_global)."""
    import numpy as np

    rng = np.random.default_rng(1000 + step_i)
    T = 8
    return {
        "mel": (rng.standard_normal(
            (b, 2 * cfg.n_audio_ctx, cfg.n_mels)
        ) * 0.5).astype(np.float32),
        "tokens_in": rng.integers(0, cfg.n_vocab, (b, T)).astype(np.int32),
        "tokens_out": rng.integers(0, cfg.n_vocab, (b, T)).astype(np.int32),
        "loss_mask": np.ones((b, T), np.float32),
    }


def test_config():
    from whisperlive_tpu.models.whisper import WhisperConfig

    return WhisperConfig(
        n_mels=80, n_vocab=512, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )


def main() -> int:
    proc, nproc, port, outdir, local_devices = sys.argv[1:6]
    proc, nproc, local_devices = int(proc), int(nproc), int(local_devices)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisperlive_tpu.parallel import multihost

    assert multihost.init_multihost(f"127.0.0.1:{port}", nproc, proc)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * local_devices

    import jax.numpy as jnp
    import numpy as np

    from whisperlive_tpu import training
    from whisperlive_tpu.models.whisper import init_params

    cfg = test_config()
    sh = multihost.multihost_shardings(tp=2)
    assert sh.dp == nproc * local_devices // 2
    opt = training.make_optimizer(learning_rate=1e-3, warmup_steps=1)
    params = init_params(cfg, seed=0)
    params = jax.device_put(params, sh.param_shardings(params))
    state = training.TrainState(
        params, jax.jit(opt.init)(params), jnp.zeros((), jnp.int32)
    )
    step = jax.jit(training.make_train_step(cfg, opt), donate_argnums=0)

    b_global = 8
    b_local = b_global // nproc
    losses = []
    for i in range(3):
        batch = make_global_batch(cfg, i, b_global)
        local = {
            k: v[proc * b_local: (proc + 1) * b_local]
            for k, v in batch.items()
        }
        dev = {
            k: multihost.local_batch_to_global(
                v, sh.batch_sharding(v.ndim)
            )
            for k, v in local.items()
        }
        state, loss = step(state, dev)
        # the loss is replicated over the global mesh -> same float on
        # every host without any extra collective
        losses.append(float(np.asarray(jax.device_get(loss))))

    multihost.save_checkpoint(os.path.join(outdir, "ckpt"), state, cfg)
    multihost.barrier("done")
    print("WLMH " + json.dumps({"proc": proc, "losses": losses}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
