"""Pallas int8-weight matmul: dequantize per-tile in VMEM.

Motivation: with plain `jnp.dot(x, w8.astype(bf16)) * s`, XLA hoists the
loop-invariant int8->bf16 convert OUT of the decode while-loop, so every
step still streams bfloat16 weight bytes from HBM (measured: int8 weights
gave +2.5% instead of the expected ~+25%). This kernel keeps the HBM-side
arrays int8 and converts tiles in VMEM right before the MXU multiply, so
the decoder's per-token weight traffic is genuinely halved.

Two layouts:
  int8_matmul    x[M,K] @ w8[K,N] * s[N]      (linear layers)
  int8_matmul_t  x[M,K] @ w8[N,K]^T * s[N]    (tied-embedding logits)

M is padded to the sublane minimum; block_n is shrunk to the largest
lane-aligned divisor of N (no padded zero columns streamed for the model
dims 1280/5120/...); N without any 128-multiple divisor (the 51866 vocab)
falls back to padding.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_kn(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]  # [M, K]
    w = w_ref[...].astype(x.dtype)  # [K, BN] int8 -> compute dtype (in VMEM)
    s = s_ref[...].astype(jnp.float32)  # [1, BN]
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s).astype(o_ref.dtype)


def _kernel_nk(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]  # [M, K]
    w = w_ref[...].astype(x.dtype)  # [BN, K]
    s = s_ref[...].astype(jnp.float32)  # [1, BN]
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s).astype(o_ref.dtype)


def _pick_block_n(n: int, cap: int) -> int:
    """Largest lane-aligned (multiple-of-128) divisor of n that is <= cap.

    A divisor means the grid tiles n exactly and the kernel never streams
    padded zero columns from HBM (for d_model=1280 a fixed 512 block pads
    to 1536 — +20% dead int8 bytes on every decode step). Falls back to
    min(cap, n) (the padding path) when no aligned divisor exists
    (e.g. the 51866-row vocab).
    """
    for d in range(min(cap, n) - min(cap, n) % 128, 0, -128):
        if n % d == 0:
            return d
    return min(cap, n)


def _pad_rows(x, mult):
    m = x.shape[0]
    pad = (-m) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


def _run(kernel, x, w8, s, n, k_axis_shape, block_n, out_dtype, interpret,
         block_m: int = 256):
    x, m_real = _pad_rows(x, 16)
    m = x.shape[0]
    block_m = min(block_m, m)
    m_pad = (-m) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        m += m_pad
    n_pad = (-n) % block_n
    if n_pad:
        pad_spec = ((0, n_pad), (0, 0)) if kernel is _kernel_nk else ((0, 0), (0, n_pad))
        w8 = jnp.pad(w8, pad_spec)
        s = jnp.pad(s, ((0, n_pad),))
    n_total = n + n_pad
    grid = (m // block_m, n_total // block_n)
    if kernel is _kernel_nk:
        w_spec = pl.BlockSpec((block_n, k_axis_shape), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((k_axis_shape, block_n), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n_total), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k_axis_shape), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w8, s[None, :])
    return out[:m_real, :n]


def int8_matmul(
    x: jax.Array,  # [M, K] compute dtype
    w8: jax.Array,  # [K, N] int8
    s: jax.Array,  # [N] scales
    block_n: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    k, n = w8.shape
    return _run(_kernel_kn, x, w8, s, n, k, _pick_block_n(n, block_n),
                out_dtype or x.dtype, interpret)


def int8_matmul_t(
    x: jax.Array,  # [M, K]
    w8: jax.Array,  # [N, K] int8 (e.g. token embedding [V, d])
    s: jax.Array,  # [N]
    block_n: int = 1024,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    n, k = w8.shape
    return _run(_kernel_nk, x, w8, s, n, k, _pick_block_n(n, block_n), out_dtype,
                interpret)
