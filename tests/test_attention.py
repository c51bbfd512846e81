"""Fused Pallas attention vs the naive reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlive_tpu.models.whisper import _attention, _split_heads
from whisperlive_tpu.ops.attention import fused_attention


@pytest.mark.parametrize("t", [128, 300, 1500])
def test_fused_matches_naive(rng, t):
    b, h, hd = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    ref, _ = _attention(q, k, v, None)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_handles_uneven_block(rng):
    b, t, h, hd = 1, 200, 2, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    ref, _ = _attention(q, q, q, None)
    out = fused_attention(q, q, q, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
