"""Chip smoke for the length-aware block DMA in the int8 skip kernel.

Verifies on the REAL device that (a) active rows are bit-identical to the
plain masked kernel, and (b) short per-slot lengths actually reduce the
kernel's wall time (the whole point: the DMA volume tracks content).
Run: python scripts/smoke_blockdma.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from whisperlive_tpu.ops.attention import cross_attention_int8


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind)
    rng = np.random.default_rng(0)
    b, h, t, hd = 16, 20, 640, 64  # large-v3 serving shapes
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.bfloat16)
    kvp = jnp.asarray(rng.integers(-127, 127, (b, h, t, 2 * hd)), jnp.int8)
    active = jnp.ones((b,), bool)

    @jax.jit
    def masked(q, kvp, lengths):
        return cross_attention_int8(q, kvp, lengths=lengths)

    INNER = 512  # resolve the kernel above the ~30 ms relay dispatch cost

    @jax.jit
    def skip(q, kvp, lengths):
        def body(_, qq):
            o = cross_attention_int8(qq, kvp, lengths=lengths, active=active)
            return (qq + o.astype(qq.dtype) * 1e-6).astype(qq.dtype)

        return jax.lax.fori_loop(0, INNER, body, q).sum(dtype=jnp.float32)

    @jax.jit
    def plain(q, kvp, lengths):
        def body(_, qq):
            o = cross_attention_int8(qq, kvp, lengths=lengths)
            return (qq + o.astype(qq.dtype) * 1e-6).astype(qq.dtype)

        return jax.lax.fori_loop(0, INNER, body, q).sum(dtype=jnp.float32)

    @jax.jit
    def skip_once(q, kvp, lengths):
        return cross_attention_int8(q, kvp, lengths=lengths, active=active)

    for lens in ([640] * b, [512] * b, [128] * b, [100, 640] * (b // 2)):
        lengths = jnp.asarray(lens, jnp.int32)
        ref = np.asarray(masked(q, kvp, lengths))
        got = np.asarray(skip_once(q, kvp, lengths))
        np.testing.assert_array_equal(got, ref)
        row = f"lengths~{float(np.mean(lens)):6.0f}: exact-match OK"
        for name, fn in (("skip", skip), ("plain", plain)):
            np.asarray(fn(q, kvp, lengths))  # warm
            t0 = time.monotonic()
            for _ in range(3):
                np.asarray(fn(q, kvp, lengths))
            dt = (time.monotonic() - t0) / (3 * INNER)
            row += f", {name} {dt * 1e6:7.1f} us"
        print(row)


if __name__ == "__main__":
    main()
