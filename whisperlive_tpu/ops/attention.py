"""Fused attention kernels (Pallas / TPU).

The encoder's self-attention at T=1500 is the FLOP hot spot, and a naive
einsum+softmax+einsum materializes a [B, H, 1500, 1500] float32 score
tensor (~360 MB at B=8) through HBM per layer — measured ~19x off the
roofline. This kernel keeps everything for one (batch, head) in VMEM:
K/V for 1500 positions at hd=64 are only ~380 KB, so no streaming is
needed — one q-block x full-K fused pass per grid cell:

    grid = (B*H, T_padded / BLOCK_Q)
    scores = q_blk @ k^T   (MXU, f32 accum)  -> mask tail -> softmax (VPU)
    out    = probs @ v     (MXU)

Sequence lengths are padded to a multiple of 128 (lane width); the pad
columns are masked to -inf and pad rows are sliced off by the caller.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., C/2] int8 (two signed nibbles) -> [..., C] int8.

    HALVES layout: channel c < C/2 sits in the low nibble of byte c, channel
    C/2 + c in its high nibble — so unpacking is a lane-dim concat (Mosaic
    cannot insert minor dims on 8-bit types) and kernels can equivalently
    split a matmul into low/high halves without unpacking at all."""
    low = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    high = jnp.right_shift(packed, 4)
    return jnp.concatenate([low, high], axis=-1)


def pack_int4(values: jax.Array) -> jax.Array:
    """[..., C] int8 in [-8, 7] -> [..., C/2] packed int8 (halves layout)."""
    c = values.shape[-1]
    low = values[..., : c // 2]
    high = values[..., c // 2:]
    return jnp.bitwise_or(
        jnp.bitwise_and(low, jnp.int8(0x0F)), jnp.left_shift(high, 4)
    ).astype(jnp.int8)


def _cross_attn_int4_kernel(*refs, scale: float, masked: bool = True):
    """Decode-step cross-attention over int4-packed KV, unpacked in VMEM.

    Per grid cell = one (batch, head). Block shapes: q/out [1, H, hd] (the
    head row is selected dynamically — Mosaic requires sublane dims to be 8-
    divisible or whole), k/v [1, 1, T, hd/2] int8 packed head-major. No
    reshapes inside — Mosaic cannot shape-cast across the lane dimension.
    masked=True adds a [B] SMEM lengths ref as the first operand."""
    if masked:
        len_ref, q_ref, k_ref, v_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        len_ref = None
    n_head = q_ref.shape[1]
    hd2 = k_ref.shape[-1]
    dtype = q_ref.dtype

    # halves layout: low nibbles hold channels [0, hd/2), high nibbles
    # [hd/2, hd) — scores split into two half-width matmuls, no unpack
    # concat on 8-bit lanes needed. Nibble extraction in int32 arithmetic:
    # Mosaic does not legalize shifts on int8 vectors.
    def nibbles(p8):
        p32 = p8.astype(jnp.int32)
        hi = jnp.floor_divide(p32, 16)  # == arithmetic >>4 incl. negatives
        lo_u = p32 - hi * 16  # 0..15
        lo = lo_u - 16 * (lo_u >= 8)
        return lo.astype(dtype), hi.astype(dtype)

    # heads unrolled statically: one grid cell per batch item keeps the
    # HBM->VMEM DMAs large (per-(b,h) cells were 20x slower)
    for h in range(n_head):
        q = q_ref[0, h][None]  # [1, hd] (static head index)
        k_lo, k_hi = nibbles(k_ref[0, h])  # [T, hd/2] each
        contract = (((1,), (1,)), ((), ()))
        scores = (
            jax.lax.dot_general(q[:, :hd2], k_lo, contract,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(q[:, hd2:], k_hi, contract,
                                  preferred_element_type=jnp.float32)
        ) * scale  # [1, T]
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(
                col < len_ref[pl.program_id(0)], scores, NEG_INF
            )
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)

        v_lo, v_hi = nibbles(v_ref[0, h])
        pv = (((1,), (0,)), ((), ()))
        out_lo = jax.lax.dot_general(probs, v_lo, pv,
                                     preferred_element_type=jnp.float32)
        out_hi = jax.lax.dot_general(probs, v_hi, pv,
                                     preferred_element_type=jnp.float32)
        o_ref[0, h, :hd2] = out_lo[0]
        o_ref[0, h, hd2:] = out_hi[0]


def cross_attention_int4(
    q: jax.Array,  # [B, H, hd] compute dtype, K-scales already folded in
    k4: jax.Array,  # [B, H, T, hd/2] int8 packed (HEAD-MAJOR)
    v4: jax.Array,  # [B, H, T, hd/2] int8 packed
    lengths: jax.Array | None = None,  # [B] int32 valid positions
    interpret: bool = False,
) -> jax.Array:
    """Single-token cross-attention reading int4 KV directly from HBM.

    Returns [B, H, hd] float32 (apply per-channel V scales outside).
    Exists because a jnp unpack of loop-invariant KV gets hoisted out of
    the decode while-loop by XLA, materializing a full-precision copy.
    `lengths` masks positions >= lengths[b] (reduced-context windows share
    the full-size KV region; the tail holds stale data); None compiles the
    UNMASKED kernel (zero overhead on the full-context path)."""
    b, h, t, hd2 = k4.shape
    hd = hd2 * 2
    masked = lengths is not None
    specs = [
        pl.BlockSpec((1, h, hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k4, v4]
    if masked:
        # whole [B] vector in SMEM (Mosaic requires rank-1 blocks to
        # cover the array); the kernel indexes it by program_id
        specs.insert(
            0, pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        args.insert(0, lengths.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(
            _cross_attn_int4_kernel, scale=hd**-0.5, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out


def _cross_attn_int8_kernel(*refs, scale: float, masked: bool = True):
    """Decode-step cross-attention over PACKED int8 KV, dequantized in VMEM.

    Per grid cell = one (batch, head-set). Block shapes: q/out [1, H, 2*hd]
    (query zero-padded into the V lanes), kv [1, H, T, 2*hd] int8
    head-major with K in lanes [:hd] and V in lanes [hd:].

    The kernel exists because a jnp `astype` dequant of loop-invariant KV
    gets hoisted out of the decode while_loop by XLA, materializing a bf16
    copy in HBM that erases the int8 savings — the int8 bytes must stream
    HBM->VMEM and widen on-core. The PACKED K|V layout exists because a
    stacked [2, ...] K/V array gets its leading 2 merged into the minor
    dim by XLA layout assignment, and the resulting 64-of-128-lane views
    cannot be sliced by Mosaic (memref_slice requires tile-aligned minor
    dims) — chip-verified failure mode of the active-skip DMA path. With
    K|V side by side in one 128-lane row, the zero-padded query makes the
    K-contraction exact (V lanes contribute q=0 terms) and probs @ kv
    yields the V output in lanes [hd:], sliced off outside the kernel;
    the MXU pads 64-lane contractions to 128 anyway, so the widened dots
    are free. masked=True adds a [B] SMEM lengths ref as the first operand
    (reduced-context windows); masked=False compiles without it — the
    full-context serving path pays zero masking overhead."""
    if masked:
        len_ref, q_ref, kv_ref, o_ref = refs
    else:
        q_ref, kv_ref, o_ref = refs
        len_ref = None
    n_head = q_ref.shape[1]
    dtype = q_ref.dtype

    # heads unrolled statically: one grid cell per batch item keeps the
    # HBM->VMEM DMAs large (per-(b,h) cells measured ~20x slower on the
    # int4 variant above)
    for h in range(n_head):
        q = q_ref[0, h][None]  # [1, 2*hd] (static head; V lanes are zero)
        kv = kv_ref[0, h].astype(dtype)  # [T, 2*hd]
        scores = jax.lax.dot_general(
            q, kv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [1, T] == q . k  (V lanes of q are zero)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(
                col < len_ref[pl.program_id(0)], scores, NEG_INF
            )
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        o_ref[0, h] = jax.lax.dot_general(
            probs, kv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]  # [2*hd]; the V output sits in lanes [hd:]


def _cross_attn_int8_dma_kernel(
    act_ref,  # [B] int32 SMEM
    len_ref,  # [B] int32 SMEM
    q_ref,  # [1, H, 2*hd] or [1, H, Tq, 2*hd] VMEM (V lanes zero)
    kv_ref,  # [B, H, T, 2*hd] int8 packed, resident in HBM (manual DMA)
    o_ref,  # like q, f32 VMEM
    kv_vmem,  # [H, T, 2*hd] int8 scratch
    sem,  # DMA semaphore
    *,
    scale: float,
    block_dma: bool = False,
):
    """Active-slot DMA-skipping variant of the int8 decode kernels: the
    packed K|V stays in HBM and is copied HBM->VMEM ONLY for active slots,
    under an explicit @pl.when guard. (A first cut tried to get the skip
    for free from the block pipeline by index-mapping inactive cells to a
    repeated block — chip-measured: the pipeline re-issues DMAs for
    dynamically equal indices, zero savings. Explicit conditional DMA is
    definitive. A second cut passed K and V as two HBM operands sliced
    from the stacked [2, ...] array — Mosaic rejects the memref_slice
    because XLA merges the stacked axis into the minor dim; hence the
    packed single-operand layout, which also halves the DMA count.)
    Inactive cells write nothing: their output rows are unspecified and
    the caller's write masks must discard them. The per-cell DMA is
    serialized with its compute (no cross-cell double buffering); at full
    occupancy this ties the pipelined kernel within ~10% (chip-measured)
    and at partial occupancy the skipped cells win outright.

    LENGTH-AWARE BLOCK DMA (opt-in, WL_BLOCK_DMA=1): when T divides into
    128-position blocks, an active slot copies only ceil(len/128) blocks
    instead of the whole [H, T, 2*hd] slab. VMEM rows beyond the copied
    blocks hold stale data from a previous grid cell; the existing len
    mask turns them into exact-zero softmax probability (NEG_INF is
    f32-min; exp underflows to 0), the same guarantee the masked
    full-copy path already relies on for the region between len and T.
    All blocks are started before any is waited on.

    Chip-measured NEGATIVE result on the relay v5e (scripts/
    smoke_blockdma.py, B=16 H=20 T=640): bit-exact, but the per-cell DMA
    at this T is LATENCY-bound, not bandwidth-bound — the whole-slab
    pipelined kernel runs ~160 us/layer (≈164 GB/s effective, 3x the
    T=2048 envelope) while block DMA costs 171-203 us (per-descriptor
    setup of 20 strided 16 KB segments per block dominates; 5x fewer
    bytes buys ~16%). Default stays whole-slab; revisit on real silicon
    where HBM bandwidth, not descriptor latency, floors the stream (same
    calculus as the int4 cross-KV negative, BENCH_NOTES round 1)."""
    i = pl.program_id(0)

    @pl.when(act_ref[i] != 0)
    def _():
        t = kv_ref.shape[2]
        blk = 128
        if block_dma and t % blk == 0 and t > blk:
            nblk = jnp.clip(
                jax.lax.div(len_ref[i] + blk - 1, blk), 1, t // blk
            )

            def start(j, _):
                pltpu.make_async_copy(
                    kv_ref.at[i, :, pl.ds(j * blk, blk)],
                    kv_vmem.at[:, pl.ds(j * blk, blk)],
                    sem,
                ).start()
                return 0

            def wait(j, _):
                # equal-shaped descriptor: waits one block's completion
                pltpu.make_async_copy(
                    kv_ref.at[i, :, pl.ds(0, blk)],
                    kv_vmem.at[:, pl.ds(0, blk)],
                    sem,
                ).wait()
                return 0

            jax.lax.fori_loop(0, nblk, start, 0)
            jax.lax.fori_loop(0, nblk, wait, 0)
        else:
            cp = pltpu.make_async_copy(kv_ref.at[i], kv_vmem, sem)
            cp.start()
            cp.wait()
        n_head = q_ref.shape[1]
        dtype = q_ref.dtype
        windowed = q_ref.ndim == 4
        for h in range(n_head):
            q = q_ref[0, h] if windowed else q_ref[0, h][None]  # [Tq|1,2hd]
            kv = kv_vmem[h].astype(dtype)  # [T, 2*hd]
            scores = jax.lax.dot_general(
                q, kv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Tq|1, T]
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < len_ref[i], scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            out = jax.lax.dot_general(
                probs, kv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Tq|1, 2*hd]
            o_ref[0, h] = out if windowed else out[0]


def _cross_attention_int8_skip(
    qp: jax.Array,  # [B, H, 2*hd] or [B, H, Tq, 2*hd], V lanes zero
    kvp: jax.Array,  # [B, H, T, 2*hd] int8 packed
    lengths: jax.Array,
    active: jax.Array,  # [B] bool
    interpret: bool = False,
) -> jax.Array:
    """Skip-DMA path shared by the single-query and window int8 kernels.
    Returns FULL-WIDTH [B, ..., 2*hd] float32 — the V output sits in lanes
    [hd:] and the wrappers slice it off. Output rows of INACTIVE slots are
    unspecified (never written) — the lockstep step's write masks already
    discard everything derived from them; callers must not read them."""
    b, h, t, hd2 = kvp.shape
    qblock = (1,) + qp.shape[1:]
    qmap = (lambda i: (i, 0, 0)) if qp.ndim == 3 else (lambda i: (i, 0, 0, 0))
    block_dma = os.environ.get("WL_BLOCK_DMA", "0") == "1"
    return pl.pallas_call(
        functools.partial(
            _cross_attn_int8_dma_kernel, scale=(hd2 // 2) ** -0.5,
            block_dma=block_dma,
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(qblock, qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed KV stays in HBM
        ],
        out_specs=pl.BlockSpec(qblock, qmap, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, t, hd2), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        active.astype(jnp.int32), lengths.astype(jnp.int32), qp, kvp
    )


def cross_attention_int8(
    q: jax.Array,  # [B, H, hd] compute dtype, K-scales already folded in
    kvp: jax.Array,  # [B, H, T, 2*hd] int8 packed (K lanes [:hd], V [hd:])
    lengths: jax.Array | None = None,  # [B] int32 valid positions
    interpret: bool = False,
    active: jax.Array | None = None,  # [B] bool — skip inactive slots' DMA
) -> jax.Array:
    """Single-token cross-attention reading packed int8 KV from HBM.

    Returns [B, H, hd] float32 (apply per-channel V scales outside).
    `lengths` masks positions >= lengths[b] (reduced-context windows share
    the full-size KV region; the tail holds stale data); None compiles the
    UNMASKED kernel, so the full-context serving path pays zero masking
    overhead (measured ~4% of bulk RTFx). `active` (requires `lengths`)
    additionally skips the K/V DMA of inactive slots entirely — their
    output rows are unspecified. See _cross_attn_int8_kernel for why the
    KV must be packed K|V in one 128-lane row."""
    b, h, t, hd2 = kvp.shape
    hd = hd2 // 2
    qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    if active is not None:
        assert lengths is not None, "active-skip requires per-slot lengths"
        out = _cross_attention_int8_skip(
            qp, kvp, lengths, active, interpret=interpret
        )
        return out[..., hd:]
    masked = lengths is not None
    specs = [
        pl.BlockSpec((1, h, hd2), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kvp]
    if masked:
        # whole [B] vector in SMEM (Mosaic requires rank-1 blocks to
        # cover the array); the kernel indexes it by program_id
        specs.insert(
            0, pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        args.insert(0, lengths.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(
            _cross_attn_int8_kernel, scale=hd**-0.5, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, hd2), jnp.float32),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, hd2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[..., hd:]


def _cross_attn_int8_window_kernel(*refs, scale: float, masked: bool):
    """Multi-query variant of _cross_attn_int8_kernel: Tq query tokens
    attend the same packed int8 KV, which streams HBM->VMEM ONCE for the
    whole window — the speculative-verify pass reads the dominant decode
    HBM term once per k+1 tokens instead of once per token."""
    if masked:
        len_ref, q_ref, kv_ref, o_ref = refs
    else:
        q_ref, kv_ref, o_ref = refs
        len_ref = None
    n_head = q_ref.shape[1]
    dtype = q_ref.dtype

    for h in range(n_head):  # heads unrolled: keeps the KV DMAs large
        q = q_ref[0, h]  # [Tq, 2*hd] (V lanes zero)
        kv = kv_ref[0, h].astype(dtype)  # [T, 2*hd]
        scores = jax.lax.dot_general(
            q, kv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Tq, T]
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(
                col < len_ref[pl.program_id(0)], scores, NEG_INF
            )
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        o_ref[0, h] = jax.lax.dot_general(
            probs, kv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tq, 2*hd]; V output in lanes [hd:]


def cross_attention_int8_window(
    q: jax.Array,  # [B, H, Tq, hd] compute dtype, K-scales already folded
    kvp: jax.Array,  # [B, H, T, 2*hd] int8 packed (K lanes [:hd], V [hd:])
    lengths: jax.Array | None = None,  # [B] int32 valid positions
    interpret: bool = False,
    active: jax.Array | None = None,  # [B] bool — skip inactive slots' DMA
) -> jax.Array:
    """Windowed (Tq-token) cross-attention over packed int8 KV — the
    speculative decode_window path. Same contract as cross_attention_int8
    with a query window axis; returns [B, H, Tq, hd] float32."""
    b, h, t, hd2 = kvp.shape
    hd = hd2 // 2
    tq = q.shape[2]
    qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    if active is not None:
        assert lengths is not None, "active-skip requires per-slot lengths"
        out = _cross_attention_int8_skip(
            qp, kvp, lengths, active, interpret=interpret
        )
        return out[..., hd:]
    masked = lengths is not None
    specs = [
        pl.BlockSpec((1, h, tq, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kvp]
    if masked:
        specs.insert(
            0, pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        args.insert(0, lengths.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(
            _cross_attn_int8_window_kernel, scale=hd**-0.5, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, hd2), jnp.float32),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, tq, hd2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[..., hd:]


def _cross_attn_int4_window_kernel(*refs, scale: float, masked: bool):
    """Multi-query variant of _cross_attn_int4_kernel: Tq query tokens
    attend the same packed-int4 KV, which streams HBM->VMEM ONCE per
    window — without this, the speculative verify pass on a
    cross_kv_bits=4 engine falls back to a jnp unpack that XLA hoists out
    of the while_loop into a full bf16 HBM copy, erasing the int4 savings
    on exactly the dominant per-round read."""
    if masked:
        len_ref, q_ref, k_ref, v_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        len_ref = None
    n_head = q_ref.shape[1]
    hd2 = k_ref.shape[-1]
    dtype = q_ref.dtype

    def nibbles(p8):
        # int32 arithmetic: Mosaic does not legalize shifts on int8 vectors
        p32 = p8.astype(jnp.int32)
        hi = jnp.floor_divide(p32, 16)  # arithmetic >>4 incl. negatives
        lo_u = p32 - hi * 16  # 0..15
        lo = lo_u - 16 * (lo_u >= 8)
        return lo.astype(dtype), hi.astype(dtype)

    for h in range(n_head):  # heads unrolled: keeps the KV DMAs large
        q = q_ref[0, h]  # [Tq, hd]
        k_lo, k_hi = nibbles(k_ref[0, h])  # [T, hd/2] each
        contract = (((1,), (1,)), ((), ()))
        scores = (
            jax.lax.dot_general(q[:, :hd2], k_lo, contract,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(q[:, hd2:], k_hi, contract,
                                  preferred_element_type=jnp.float32)
        ) * scale  # [Tq, T]
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(
                col < len_ref[pl.program_id(0)], scores, NEG_INF
            )
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        v_lo, v_hi = nibbles(v_ref[0, h])
        pv = (((1,), (0,)), ((), ()))
        o_ref[0, h, :, :hd2] = jax.lax.dot_general(
            probs, v_lo, pv, preferred_element_type=jnp.float32
        )
        o_ref[0, h, :, hd2:] = jax.lax.dot_general(
            probs, v_hi, pv, preferred_element_type=jnp.float32
        )


def cross_attention_int4_window(
    q: jax.Array,  # [B, H, Tq, hd] compute dtype, K-scales already folded in
    k4: jax.Array,  # [B, H, T, hd/2] int8 packed (HEAD-MAJOR)
    v4: jax.Array,  # [B, H, T, hd/2] int8 packed
    lengths: jax.Array | None = None,  # [B] int32 valid positions
    interpret: bool = False,
) -> jax.Array:
    """Windowed (Tq-token) cross-attention over packed int4 KV — the
    speculative decode_window path on a cross_kv_bits=4 engine. Same
    contract as cross_attention_int4 with a query window axis; returns
    [B, H, Tq, hd] float32 (apply per-channel V scales outside)."""
    b, h, t, hd2 = k4.shape
    hd = hd2 * 2
    tq = q.shape[2]
    masked = lengths is not None
    specs = [
        pl.BlockSpec((1, h, tq, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, hd2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k4, v4]
    if masked:
        specs.insert(
            0, pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        args.insert(0, lengths.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(
            _cross_attn_int4_window_kernel, scale=hd**-0.5, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, hd), jnp.float32),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, tq, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float):
    q = q_ref[0]  # [BLOCK_Q, hd]
    k = k_ref[0]  # [T_pad, hd]
    v = v_ref[0]  # [T_pad, hd]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BLOCK_Q, T_pad]
    t_pad = scores.shape[-1]
    if valid_len < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_len, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention(
    q: jax.Array,  # [B, T, H, hd]
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional fused attention (encoder). Returns [B, T, H, hd].

    Scaling convention matches models/whisper.py: scores * hd**-0.5.
    """
    b, t, h, hd = q.shape
    scale = hd ** -0.5
    t_pad = -(-t // 128) * 128
    block_q = min(block_q, t_pad)
    # pad T so blocks tile evenly
    while t_pad % block_q:
        t_pad += 128

    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, t, hd)  # [BH, T, hd]
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qr, kr, vr = prep(q), prep(k), prep(v)
    grid = (b * h, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, valid_len=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qr, kr, vr)

    out = out[:, :t].reshape(b, h, t, hd)
    return jnp.swapaxes(out, 1, 2)
