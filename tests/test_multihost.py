"""Multi-host training over REAL processes: two jax.distributed workers
(4 virtual CPU devices each) train the same model the single-process
8-device mesh trains, to the same losses — validating the full
multi-host seam the dryrun can't: cross-process gloo collectives on the
dp axis, per-host batch feeding (make_array_from_process_local_data),
and proc-0-only orbax checkpointing with barriers.

The reference has no multi-host (or any multi-device) capability —
SURVEY §5. The quality bar here is self-consistency: topology must not
change the math."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import multihost_worker as mhw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    """Launch the 2-process training job once; tests assert on its outputs."""
    outdir = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_TRACEBACK_FILTERING": "off",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", str(port), str(outdir), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WLMH "):
                d = json.loads(line[5:])
                results[d["proc"]] = d["losses"]
    assert set(results) == {0, 1}, f"missing worker output: {outs}"
    return outdir, results


def _reference_losses():
    """The same 3-step job on this process's own 8-device mesh."""
    from whisperlive_tpu import training
    from whisperlive_tpu.models.whisper import init_params
    from whisperlive_tpu.parallel.mesh import EngineShardings

    cfg = mhw.test_config()
    sh = EngineShardings.create(tp=2)
    opt = training.make_optimizer(learning_rate=1e-3, warmup_steps=1)
    params = init_params(cfg, seed=0)
    params = jax.device_put(params, sh.param_shardings(params))
    state = training.TrainState(
        params, jax.jit(opt.init)(params), jnp.zeros((), jnp.int32)
    )
    step = jax.jit(training.make_train_step(cfg, opt), donate_argnums=0)
    losses = []
    for i in range(3):
        batch = mhw.make_global_batch(cfg, i, 8)
        dev = {
            k: jax.device_put(v, sh.batch_sharding(v.ndim))
            for k, v in batch.items()
        }
        state, loss = step(state, dev)
        losses.append(float(loss))
    return losses, jax.device_get(state.params), cfg, opt


def test_two_processes_match_single_process(multihost_run):
    _, results = multihost_run
    # both hosts observed the identical (replicated) loss stream
    np.testing.assert_allclose(results[0], results[1], rtol=0, atol=0)
    ref, _, _, _ = _reference_losses()
    # and the cross-process topology reproduces the single-process math
    # (different collective schedules -> tiny float drift allowed)
    np.testing.assert_allclose(results[0], ref, rtol=1e-4, atol=1e-5)


def test_primary_checkpoint_restores(multihost_run):
    outdir, _ = multihost_run
    from whisperlive_tpu import training

    _, ref_params, cfg, opt = _reference_losses()
    state, loaded_cfg = training.load_checkpoint(
        str(outdir / "ckpt"), opt
    )
    assert loaded_cfg == cfg
    assert int(state.step) == 3
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_got = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(state.params)
    }
    checked = 0
    for key, ref_leaf in flat_ref:
        got = flat_got[jax.tree_util.keystr(key)]
        assert got.shape == np.shape(ref_leaf)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_leaf), rtol=2e-3, atol=1e-4,
            err_msg=f"param {jax.tree_util.keystr(key)} diverged",
        )
        checked += 1
    assert checked > 20
