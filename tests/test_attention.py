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


def test_int8_matmul_kernels(rng):
    from whisperlive_tpu.ops.quant_matmul import int8_matmul, int8_matmul_t

    m, k, n = 8, 64, 384
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    s = (np.abs(w).max(axis=0) / 127.0).astype(np.float32)
    w8 = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    ref = x @ jnp.asarray(w8.astype(np.float32) * s)
    out = int8_matmul(x, jnp.asarray(w8), jnp.asarray(s), block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)

    # transposed layout (vocab-major), uneven N forcing padding
    n2 = 200
    wt = rng.standard_normal((n2, k)).astype(np.float32)
    st = (np.abs(wt).max(axis=1) / 127.0).astype(np.float32)
    w8t = np.clip(np.round(wt / st[:, None]), -127, 127).astype(np.int8)
    ref2 = x @ jnp.asarray((w8t.astype(np.float32) * st[:, None]).T)
    out2 = int8_matmul_t(x, jnp.asarray(w8t), jnp.asarray(st), block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-3, rtol=1e-3)


def test_cross_attention_int4_kernel_matches_jnp(rng):
    """Pallas int4 cross-attention (interpret mode) vs the jnp unpack path."""
    from whisperlive_tpu.ops.attention import (
        cross_attention_int4,
        pack_int4,
        unpack_int4,
    )

    b, t, h, hd = 2, 96, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    kq = rng.integers(-8, 8, (b, h, t, hd)).astype(np.int8)  # head-major
    vq = rng.integers(-8, 8, (b, h, t, hd)).astype(np.int8)
    k4 = pack_int4(jnp.asarray(kq))
    v4 = pack_int4(jnp.asarray(vq))

    out = np.asarray(cross_attention_int4(q, k4, v4, interpret=True))

    k = np.asarray(unpack_int4(k4)).astype(np.float32).transpose(0, 2, 1, 3)
    v = np.asarray(unpack_int4(v4)).astype(np.float32).transpose(0, 2, 1, 3)
    scores = np.einsum("bhd,bthd->bht", np.asarray(q), k) * hd**-0.5
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bht,bthd->bhd", probs, v)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_cross_attention_int8_kernel_matches_jnp(rng):
    """Pallas int8 cross-attention (interpret mode) vs the jnp dequant path."""
    from whisperlive_tpu.ops.attention import cross_attention_int8

    b, t, h, hd = 2, 96, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    kq = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)  # head-major
    vq = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)

    kvp = jnp.concatenate([jnp.asarray(kq), jnp.asarray(vq)], axis=-1)
    out = np.asarray(cross_attention_int8(q, kvp, interpret=True))

    k = kq.astype(np.float32).transpose(0, 2, 1, 3)
    v = vq.astype(np.float32).transpose(0, 2, 1, 3)
    scores = np.einsum("bhd,bthd->bht", np.asarray(q), k) * hd**-0.5
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bht,bthd->bhd", probs, v)
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-3)


def test_cross_attention_int8_length_mask(rng):
    """lengths[b] masks the stale tail of a shared-size KV region: the
    kernel output must equal plain attention computed over only the first
    lengths[b] positions."""
    import jax.numpy as jnp
    from whisperlive_tpu.ops.attention import cross_attention_int8

    b, h, t, hd = 2, 2, 16, 8
    q = rng.standard_normal((b, h, hd)).astype(np.float32)
    k = (rng.standard_normal((b, h, t, hd)) * 40).astype(np.int8)
    v = (rng.standard_normal((b, h, t, hd)) * 40).astype(np.int8)
    lengths = np.asarray([5, 16], np.int32)
    kvp = jnp.concatenate([jnp.asarray(k), jnp.asarray(v)], axis=-1)
    out = np.asarray(
        cross_attention_int8(
            jnp.asarray(q), kvp, lengths=jnp.asarray(lengths), interpret=True,
        )
    )
    for bi in range(b):
        n = lengths[bi]
        for hi in range(h):
            scores = (q[bi, hi] @ k[bi, hi, :n].astype(np.float32).T) * hd**-0.5
            p = np.exp(scores - scores.max())
            p /= p.sum()
            ref = p @ v[bi, hi, :n].astype(np.float32)
            np.testing.assert_allclose(out[bi, hi], ref, atol=1e-3, rtol=1e-3)


def test_cross_attention_int8_window_matches_jnp(rng):
    """Windowed (Tq>1) Pallas int8 cross-attention — the speculative
    verify path — vs the jnp dequant reference, masked and unmasked."""
    import jax.numpy as jnp
    from whisperlive_tpu.ops.attention import cross_attention_int8_window

    b, t, h, hd, tq = 2, 96, 4, 64, 5
    q = jnp.asarray(rng.standard_normal((b, h, tq, hd)), jnp.float32)
    kq = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)

    def ref(n_valid):
        out = np.zeros((b, h, tq, hd), np.float32)
        for bi in range(b):
            n = n_valid[bi]
            for hi in range(h):
                scores = (
                    np.asarray(q)[bi, hi] @ kq[bi, hi, :n].astype(np.float32).T
                ) * hd**-0.5
                p = np.exp(scores - scores.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                out[bi, hi] = p @ vq[bi, hi, :n].astype(np.float32)
        return out

    kvp = jnp.concatenate([jnp.asarray(kq), jnp.asarray(vq)], axis=-1)
    out = np.asarray(cross_attention_int8_window(q, kvp, interpret=True))
    np.testing.assert_allclose(out, ref([t, t]), atol=1e-2, rtol=1e-3)

    lengths = np.asarray([17, 96], np.int32)
    out_m = np.asarray(
        cross_attention_int8_window(
            q, kvp, lengths=jnp.asarray(lengths), interpret=True,
        )
    )
    np.testing.assert_allclose(out_m, ref(lengths), atol=1e-2, rtol=1e-3)


def test_cross_attention_int4_window_matches_jnp(rng):
    """Windowed (Tq>1) Pallas int4 cross-attention — the speculative
    verify path on a cross_kv_bits=4 engine — vs the jnp unpack
    reference, masked and unmasked."""
    import jax.numpy as jnp
    from whisperlive_tpu.ops.attention import (
        cross_attention_int4_window,
        pack_int4,
        unpack_int4,
    )

    b, t, h, hd, tq = 2, 96, 4, 64, 5
    q = jnp.asarray(rng.standard_normal((b, h, tq, hd)), jnp.float32)
    kq = rng.integers(-8, 8, (b, h, t, hd)).astype(np.int8)
    vq = rng.integers(-8, 8, (b, h, t, hd)).astype(np.int8)
    k4 = pack_int4(jnp.asarray(kq))
    v4 = pack_int4(jnp.asarray(vq))
    # round-trip sanity: the packed halves layout reproduces the inputs
    np.testing.assert_array_equal(np.asarray(unpack_int4(k4)), kq)

    def ref(n_valid):
        out = np.zeros((b, h, tq, hd), np.float32)
        for bi in range(b):
            n = n_valid[bi]
            for hi in range(h):
                scores = (
                    np.asarray(q)[bi, hi] @ kq[bi, hi, :n].astype(np.float32).T
                ) * hd**-0.5
                p = np.exp(scores - scores.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                out[bi, hi] = p @ vq[bi, hi, :n].astype(np.float32)
        return out

    out = np.asarray(cross_attention_int4_window(q, k4, v4, interpret=True))
    np.testing.assert_allclose(out, ref([t, t]), atol=1e-2, rtol=1e-3)

    lengths = np.asarray([17, 96], np.int32)
    out_m = np.asarray(
        cross_attention_int4_window(
            q, k4, v4, lengths=jnp.asarray(lengths), interpret=True
        )
    )
    np.testing.assert_allclose(out_m, ref(lengths), atol=1e-2, rtol=1e-3)


def test_cross_attention_int8_active_skip_matches_masked():
    """Active-slot DMA skipping (ops/attention.py _cross_attention_int8_skip):
    ACTIVE rows must be bit-identical to the plain masked kernel — the
    compaction only reroutes block DMA, never changes math. Inactive rows
    are unspecified and must not be read."""
    import numpy as np
    import jax.numpy as jnp

    from whisperlive_tpu.ops.attention import (
        cross_attention_int8,
        cross_attention_int8_window,
    )

    rng = np.random.default_rng(0)
    b, h, t, hd = 5, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 127, (b, h, t, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (b, h, t, hd)), jnp.int8)
    lengths = jnp.asarray([64, 17, 64, 33, 8], jnp.int32)
    active = jnp.asarray([True, False, True, True, False])

    kvp = jnp.concatenate([k8, v8], axis=-1)
    ref = cross_attention_int8(q, kvp, lengths=lengths, interpret=True)
    got = cross_attention_int8(
        q, kvp, lengths=lengths, active=active, interpret=True
    )
    for i in range(b):
        if bool(active[i]):
            np.testing.assert_array_equal(
                np.asarray(got[i]), np.asarray(ref[i])
            )

    # all-inactive: must not crash (clamped to one slot's block)
    none_active = jnp.zeros((b,), bool)
    out = cross_attention_int8(
        q, kvp, lengths=lengths, active=none_active, interpret=True
    )
    assert out.shape == ref.shape

    # window variant (speculative verify pass)
    tq = 3
    qw = jnp.asarray(rng.standard_normal((b, h, tq, hd)), jnp.float32)
    ref_w = cross_attention_int8_window(
        qw, kvp, lengths=lengths, interpret=True
    )
    got_w = cross_attention_int8_window(
        qw, kvp, lengths=lengths, active=active, interpret=True
    )
    for i in range(b):
        if bool(active[i]):
            np.testing.assert_array_equal(
                np.asarray(got_w[i]), np.asarray(ref_w[i])
            )


def test_cross_attention_int8_skip_block_dma_matches_masked(monkeypatch):
    """Length-aware block DMA (ops/attention.py _cross_attn_int8_dma_kernel,
    opt-in WL_BLOCK_DMA=1 — chip-measured slower than the whole-slab copy
    on the latency-bound relay, kept for real-silicon HBM-bound serving):
    when T divides into 128-position blocks, an active slot copies only
    ceil(len/128) blocks. Active rows must stay bit-identical to the plain
    masked kernel — VMEM rows beyond the copied blocks hold garbage, and
    the NEG_INF mask must zero them exactly (int8 garbage widens to finite
    bf16, so 0-probability rows contribute exact zeros to the output)."""
    import numpy as np
    import jax.numpy as jnp

    monkeypatch.setenv("WL_BLOCK_DMA", "1")

    from whisperlive_tpu.ops.attention import (
        cross_attention_int8,
        cross_attention_int8_window,
    )

    rng = np.random.default_rng(7)
    b, h, t, hd = 6, 4, 256, 16  # t = 2 x 128-blocks -> block-DMA path
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 127, (b, h, t, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (b, h, t, hd)), jnp.int8)
    kvp = jnp.concatenate([k8, v8], axis=-1)
    # lengths straddling block boundaries: 1 block, exactly 1 block,
    # partial 2nd block, full T, tiny, and a dead slot
    lengths = jnp.asarray([100, 128, 130, 256, 1, 7], jnp.int32)
    active = jnp.asarray([True, True, True, True, True, False])

    ref = cross_attention_int8(q, kvp, lengths=lengths, interpret=True)
    got = cross_attention_int8(
        q, kvp, lengths=lengths, active=active, interpret=True
    )
    for i in range(b):
        if bool(active[i]):
            np.testing.assert_array_equal(
                np.asarray(got[i]), np.asarray(ref[i])
            )

    # window variant (speculative verify / windowed continuation path)
    tq = 4
    qw = jnp.asarray(rng.standard_normal((b, h, tq, hd)), jnp.float32)
    ref_w = cross_attention_int8_window(
        qw, kvp, lengths=lengths, interpret=True
    )
    got_w = cross_attention_int8_window(
        qw, kvp, lengths=lengths, active=active, interpret=True
    )
    for i in range(b):
        if bool(active[i]):
            np.testing.assert_array_equal(
                np.asarray(got_w[i]), np.asarray(ref_w[i])
            )
