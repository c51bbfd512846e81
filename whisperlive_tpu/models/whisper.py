"""Functional JAX Whisper: encoder, KV-cached decoder, alignment forward.

A from-scratch TPU-first implementation of the Whisper architecture — the
single engine that replaces all three inference backends of the reference
(whisper_live/transcriber/*; see SURVEY §2.9-§2.11). Design choices:

  * Pure functions over a parameter pytree (no Module framework on the hot
    path) so `jax.jit`/`pjit` and `shard_map` compose without ceremony.
  * Per-layer parameters are STACKED along a leading layer axis and the
    transformer stack is a `lax.scan` — one compiled layer body regardless
    of depth (compile time O(1) in layers, crucial for large-v3's 32
    layers).
  * Decoding is fully KV-cached with per-item write pointers, so a batch of
    streams with different prompt lengths shares one fixed-shape program:
    right-padded prompts + a `cur_len[B]` pointer instead of ragged shapes.
  * All matmuls run in a configurable compute dtype (bfloat16 on TPU),
    layernorms/softmax/logits in float32.

Weight layout convention: linear weights are stored [d_in, d_out] (applied
as x @ w), conv kernels [k, in, out] ('NHC','HIO','NHC'). HF checkpoints are
transposed on conversion (models/convert.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Whisper architecture hyperparameters (names follow openai conventions)."""

    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    # Compute dtype for matmuls; params stay in param dtype.
    dtype: Any = jnp.float32
    # Fused Pallas attention for the encoder (set on TPU; the naive path
    # materializes [B, H, 1500, 1500] f32 scores and is ~19x off roofline).
    fused_encoder_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_text_state // self.n_text_head

    def replace(self, **kw) -> "WhisperConfig":
        return dataclasses.replace(self, **kw)


# Official model-size catalog (dims are public Whisper architecture facts;
# mirrors the size table the reference exposes via model-size names,
# faster_whisper_backend.py:74-79).
WHISPER_CONFIGS: dict[str, WhisperConfig] = {
    "tiny": WhisperConfig(80, 51865, 1500, 384, 6, 4, 448, 384, 6, 4),
    "tiny.en": WhisperConfig(80, 51864, 1500, 384, 6, 4, 448, 384, 6, 4),
    "base": WhisperConfig(80, 51865, 1500, 512, 8, 6, 448, 512, 8, 6),
    "base.en": WhisperConfig(80, 51864, 1500, 512, 8, 6, 448, 512, 8, 6),
    "small": WhisperConfig(80, 51865, 1500, 768, 12, 12, 448, 768, 12, 12),
    "small.en": WhisperConfig(80, 51864, 1500, 768, 12, 12, 448, 768, 12, 12),
    "medium": WhisperConfig(80, 51865, 1500, 1024, 16, 24, 448, 1024, 16, 24),
    "medium.en": WhisperConfig(80, 51864, 1500, 1024, 16, 24, 448, 1024, 16, 24),
    "large-v1": WhisperConfig(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v2": WhisperConfig(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v3": WhisperConfig(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 32),
    "large-v3-turbo": WhisperConfig(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 4),
    # Distil-Whisper family: the teacher's encoder with a shallow decoder
    # (distil-whisper model cards; in the reference's serving catalog,
    # faster_whisper_backend.py:74-79).
    "distil-small.en": WhisperConfig(80, 51864, 1500, 768, 12, 12, 448, 768, 12, 4),
    "distil-medium.en": WhisperConfig(80, 51864, 1500, 1024, 16, 24, 448, 1024, 16, 2),
    "distil-large-v2": WhisperConfig(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 2),
    "distil-large-v3": WhisperConfig(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 2),
}
# The reference accepts "turbo" as shorthand for large-v3-turbo.
WHISPER_CONFIGS["turbo"] = WHISPER_CONFIGS["large-v3-turbo"]


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Sinusoidal position embedding (whisper encoder convention)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameter init (random — real deployments convert HF weights, convert.py)
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    w = jax.random.normal(key, (d_in, d_out), dtype) * jnp.asarray(d_in**-0.5, dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_attn(key, d, cross=False, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_linear(ks[0], d, d, dtype=dtype),
        "k": _init_linear(ks[1], d, d, bias=False, dtype=dtype),
        "v": _init_linear(ks[2], d, d, dtype=dtype),
        "o": _init_linear(ks[3], d, d, dtype=dtype),
    }


def _init_block(key, d, cross: bool, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = {
        "attn": _init_attn(ks[0], d, dtype=dtype),
        "attn_ln": _init_ln(d),
        "mlp": {
            "fc1": _init_linear(ks[1], d, 4 * d, dtype=dtype),
            "fc2": _init_linear(ks[2], 4 * d, d, dtype=dtype),
        },
        "mlp_ln": _init_ln(d),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], d, cross=True, dtype=dtype)
        p["cross_attn_ln"] = _init_ln(d)
    return p


def _stack_layers(blocks: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.float32) -> Params:
    """Random-init parameters with the exact pytree structure conversion emits.

    `dtype` generates weights directly in that dtype on device — large-v3 in
    float32 alone is ~6 GB of HBM, so benchmarks pass bfloat16 here.
    """
    key = jax.random.PRNGKey(seed)
    k_e, k_d, k_c1, k_c2, k_emb, k_pos = jax.random.split(key, 6)
    d, dd = cfg.n_audio_state, cfg.n_text_state

    enc_blocks = [
        _init_block(k, d, cross=False, dtype=dtype)
        for k in jax.random.split(k_e, cfg.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, dd, cross=True, dtype=dtype)
        for k in jax.random.split(k_d, cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(k_c1, (3, cfg.n_mels, d), dtype) * 0.05,
                "b": jnp.zeros((d,), dtype),
            },
            "conv2": {
                "w": jax.random.normal(k_c2, (3, d, d), dtype) * 0.05,
                "b": jnp.zeros((d,), dtype),
            },
            "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d)),
            "layers": _stack_layers(enc_blocks),
            "ln_post": _init_ln(d),
        },
        "decoder": {
            "embed": jax.random.normal(k_emb, (cfg.n_vocab, dd), dtype) * 0.02,
            # distinct key from embed: with the tied-embedding logit head a
            # shared stream makes pos[p] proportional to embed[p], injecting a
            # position/token logit correlation real checkpoints don't have.
            "pos": jax.random.normal(k_pos, (cfg.n_text_ctx, dd), dtype) * 0.01,
            "layers": _stack_layers(dec_blocks),
            "ln": _init_ln(dd),
        },
    }


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(x, p):
    if "w8" in p:
        # int8 weight-only with per-output-channel scales. On TPU the
        # dequant MUST happen per-tile in VMEM (Pallas kernel) — a plain
        # astype gets hoisted out of the decode loop by XLA and the streamed
        # bytes stay bf16.
        shape = x.shape
        m = 1
        for d_ in shape[:-1]:
            m *= d_
        # The Pallas path pays off when weights dominate the traffic (small
        # M: the decode loop and prefill). For big-M single-use matmuls
        # (cross-KV precompute at M=B*1500) XLA's native matmul with a
        # one-time dequant is at least as good.
        if jax.default_backend() in ("tpu", "axon") and m <= 512:
            from whisperlive_tpu.ops.quant_matmul import int8_matmul

            out = int8_matmul(
                x.reshape(-1, shape[-1]), p["w8"], p["s"], out_dtype=x.dtype
            ).reshape(*shape[:-1], p["w8"].shape[-1])
        else:
            out = jnp.dot(
                x, p["w8"].astype(x.dtype), preferred_element_type=x.dtype
            ) * p["s"].astype(x.dtype)
    else:
        out = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _embed_lookup(p, tokens, dtype):
    """Token-embedding rows, transparently dequantizing int8 embeddings."""
    if "embed8" in p:
        rows = p["embed8"][tokens].astype(dtype)
        return rows * p["embed_s"][tokens][..., None].astype(dtype)
    return p["embed"].astype(dtype)[tokens]


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _merge_heads(x):
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def _attention(q, k, v, mask=None):
    """q,k,v: [B, T, H, hd]; mask broadcastable to [B, H, Tq, Tk]; f32 softmax."""
    hd = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd**-0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=q.dtype)
    return out, probs


def _self_attn_full(x, p, n_head, mask):
    q = _split_heads(_linear(x, p["q"]), n_head)
    k = _split_heads(_linear(x, p["k"]), n_head)
    v = _split_heads(_linear(x, p["v"]), n_head)
    out, _ = _attention(q, k, v, mask)
    return _linear(_merge_heads(out), p["o"]), k, v


def _mlp(x, p):
    return _linear(jax.nn.gelu(_linear(x, p["fc1"]), approximate=False), p["fc2"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, p, stride):
    # x: [B, T, C]; kernel [k, in, out]; SAME-1 padding like nn.Conv1d(pad=1).
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        + p["b"].astype(x.dtype)
    )


def encode(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel [B, T_mel, n_mels] -> encoder states [B, T_mel/2, d].

    T_mel is normally 3000 (30 s), but SHORTER windows are first-class: the
    position embedding is sliced to the actual length, so streaming tails
    can run the encoder at a reduced context (e.g. 1024 frames = 10.24 s)
    for ~3x less encode compute — the TPU-native counterpart of the
    reference TRT path's padding removal (transcriber_tensorrt.py:79-149).
    Reduced-context outputs match an HF Whisper with max_source_positions
    cut to T_mel/2 (tests/test_whisper_model.py parity)."""
    p = params["encoder"]
    x = mel.astype(cfg.dtype)
    x = jax.nn.gelu(_conv1d(x, p["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv2"], 2), approximate=False)
    pos = p["pos"] if x.shape[1] == p["pos"].shape[0] else p["pos"][: x.shape[1]]
    x = x + pos.astype(cfg.dtype)

    def block(x, lp):
        h = _layer_norm(x, lp["attn_ln"])
        if cfg.fused_encoder_attention:
            from whisperlive_tpu.ops.attention import fused_attention

            q = _split_heads(_linear(h, lp["attn"]["q"]), cfg.n_audio_head)
            k = _split_heads(_linear(h, lp["attn"]["k"]), cfg.n_audio_head)
            v = _split_heads(_linear(h, lp["attn"]["v"]), cfg.n_audio_head)
            attn = _linear(_merge_heads(fused_attention(q, k, v)), lp["attn"]["o"])
        else:
            attn, _, _ = _self_attn_full(h, lp["attn"], cfg.n_audio_head, None)
        x = x + attn
        x = x + _mlp(_layer_norm(x, lp["mlp_ln"]), lp["mlp"])
        return x, None

    x, _ = jax.lax.scan(block, x, p["layers"])
    return _layer_norm(x, p["ln_post"])


# ---------------------------------------------------------------------------
# Decoder — KV-cached, per-item write pointers
# ---------------------------------------------------------------------------


def compute_cross_kv(params: Params, cfg: WhisperConfig, enc: jax.Array) -> Params:
    """Precompute per-layer cross-attention K,V from encoder output.

    Done once per window; every subsequent decode step reads ALL of it —
    at B=8 on large-v3 that is ~4 GB of HBM traffic per sampled token, the
    single largest term in the decode roofline. Returned as a pytree
    {"kv": [L, 2, B, n_audio_ctx, H, hd], "scale": None}; pass through
    `quantize_cross_kv` to store it int8 with per-channel scales (halves
    the traffic; the dequant folds into the attention matmuls).
    """

    def one_layer(_, lp):
        ca = lp["cross_attn"]
        k = _split_heads(_linear(enc, ca["k"]), cfg.n_text_head)
        v = _split_heads(_linear(enc, ca["v"]), cfg.n_text_head)
        return None, jnp.stack([k, v])

    _, kv = jax.lax.scan(one_layer, None, params["decoder"]["layers"])
    return {"kv": kv, "scale": None}


def quantize_cross_kv(cross_kv: Params) -> Params:
    """bf16 cross-KV -> int8 with per-(layer, k/v, batch, head, channel)
    scales over the position axis.

    PACKED head-major layout [L,1,B,H,T,2*hd] — K in lanes [:hd], V in
    lanes [hd:] of one 128-lane row (the dummy axis keeps the batch at
    axis 2 and T at axis 4 like every other cross-KV layout, so engine
    insert/gather/sharding code is layout-agnostic). The Pallas decode
    kernels (ops/attention.py cross_attention_int8*) slice per (batch,
    head) without any in-kernel reshape; K|V share a row because a
    stacked [2,...] array gets its leading 2 merged into the minor dim by
    XLA layout assignment, which Mosaic cannot memref_slice for the
    active-skip DMA path (chip-verified). The kernels exist because a jnp
    `astype` dequant of loop-invariant KV gets hoisted out of the decode
    while_loop, materializing a bf16 copy that erases the int8 savings."""
    kv = cross_kv["kv"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv), axis=3, keepdims=True)  # [L,2,B,1,H,hd]
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(kv / scale), -127, 127).astype(jnp.int8)
    l, _, b, t, h, hd = q.shape
    packed = jnp.transpose(q, (0, 2, 4, 3, 1, 5)).reshape(l, b, h, t, 2 * hd)
    return {"kv8": packed[:, None],
            "scale": scale.astype(jnp.bfloat16)}


def quantize_cross_kv_int4(cross_kv: Params) -> Params:
    """bf16 cross-KV -> packed int4 (two signed nibbles per int8) with
    per-channel scales. Opt-in (engine cross_kv_bits=4): halves the int8
    traffic again; decode reads it through a Pallas kernel that unpacks in
    VMEM (ops/attention.py cross_attention_int4)."""
    from whisperlive_tpu.ops.attention import pack_int4

    kv = cross_kv["kv"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv), axis=3, keepdims=True)  # [L,2,B,1,H,hd]
    scale = jnp.maximum(amax, 1e-6) / 7.0
    q = jnp.clip(jnp.round(kv / scale), -8, 7).astype(jnp.int8)
    # HEAD-MAJOR layout [L,2,B,H,T,hd/2]: the Pallas decode kernel slices
    # per (batch, head) without any in-kernel reshape.
    packed = jnp.transpose(pack_int4(q), (0, 1, 2, 4, 3, 5))
    return {"kv4": packed, "scale": scale.astype(jnp.bfloat16)}


def _cross_len_mask(ckv_t: int, cross_len) -> jax.Array | None:
    """[B] valid encoder lengths -> [B, 1, 1, T] attention mask (or None).

    Slots whose window was encoded at a REDUCED context occupy only the
    first cross_len positions of the shared cross-KV region; the tail holds
    stale data from a previous occupant and must never receive attention
    mass."""
    if cross_len is None:
        return None
    return (jnp.arange(ckv_t)[None, :] < cross_len[:, None])[:, None, None, :]


def _cross_attend(qc, ckv, dtype, collect_probs=False, cross_len=None,
                  active=None):
    """Cross-attention against one layer's (possibly quantized) KV slice.

    qc: [B, Tq, H, hd]; ckv: {"kv": [2, B, T, H, hd] bf16, or
    "kv8": [1, B, H, T, 2*hd] int8 packed head-major (K lanes [:hd], V
    lanes [hd:]; see quantize_cross_kv), or "kv4": [2, B, H, T, hd/2]
    packed int4 head-major; "scale": optional [2, B, 1, H, hd]}.
    Per-channel scales fold into q (for K) and into the output (for V), so
    the quantized arrays feed the MXU directly. cross_len: optional [B]
    int32 — valid encoder positions per item (reduced-context windows).
    active: optional [B] bool — rows whose decode output will be DISCARDED
    by the caller's write mask (done lanes awaiting harvest, released
    slots); the int8 Pallas kernels skip their K/V DMA entirely and leave
    their output rows unspecified. Honored only on the int8 TPU fast
    paths; other paths read everything (correct, just not skipped).
    """
    scale = ckv.get("scale")
    if "kv8" in ckv:
        from whisperlive_tpu.ops.attention import cross_attention_int8

        kvp = ckv["kv8"][0]  # [B, H, T, 2*hd] packed (dummy axis sliced)
        hd = kvp.shape[-1] // 2
        q_eff = qc * scale[0][:, 0][:, None].astype(qc.dtype)
        if (
            qc.shape[1] == 1
            and not collect_probs
            and jax.default_backend() in ("tpu", "axon")
        ):
            out = cross_attention_int8(
                q_eff[:, 0], kvp, lengths=cross_len,
                active=active if cross_len is not None else None,
            )
            out = out[:, None].astype(dtype) * scale[1][:, 0][:, None].astype(dtype)
            return out, None
        if (
            1 < qc.shape[1] <= 8
            and not collect_probs
            and jax.default_backend() in ("tpu", "axon")
            and os.environ.get("WL_WINDOW_KERNEL", "1") != "0"
        ):
            # speculative verify windows (decode_window): stream the int8
            # KV HBM->VMEM once for the whole Tq window instead of
            # materializing a bf16 dequant copy per layer. Capped at 8 so
            # prompt-bucket prefills (Tq=16/64/256) keep the measured
            # astype path; widen once the window kernel is benched there.
            from whisperlive_tpu.ops.attention import cross_attention_int8_window

            out = cross_attention_int8_window(
                jnp.swapaxes(q_eff, 1, 2), kvp,
                lengths=cross_len,
                active=active if cross_len is not None else None,
            )
            out = jnp.swapaxes(out, 1, 2).astype(dtype) * scale[1][:, 0][
                :, None
            ].astype(dtype)
            return out, None
        # fallback (CPU tests, prefill/align): packed head-major
        # [B, H, T, 2*hd] -> [B, T, H, hd] K and V halves (the lane slices
        # fuse into the astype/einsum consumers — no extra HBM copy)
        k = jnp.swapaxes(kvp[..., :hd], 1, 2).astype(dtype)
        v = jnp.swapaxes(kvp[..., hd:], 1, 2).astype(dtype)
        out, probs = _attention(q_eff, k, v, _cross_len_mask(k.shape[1], cross_len))
        out = out * scale[1][:, 0][:, None].astype(out.dtype)
        return (out, probs) if collect_probs else (out, None)
    if "kv4" in ckv:
        from whisperlive_tpu.ops.attention import cross_attention_int4, unpack_int4

        q_eff = qc * scale[0][:, 0][:, None].astype(qc.dtype)
        if (
            qc.shape[1] == 1
            and not collect_probs
            and jax.default_backend() in ("tpu", "axon")
        ):
            out = cross_attention_int4(
                q_eff[:, 0], ckv["kv4"][0], ckv["kv4"][1], lengths=cross_len
            )
            out = out[:, None].astype(dtype) * scale[1][:, 0][:, None].astype(dtype)
            return out, None
        if (
            1 < qc.shape[1] <= 8
            and not collect_probs
            and jax.default_backend() in ("tpu", "axon")
            and os.environ.get("WL_WINDOW_KERNEL", "1") != "0"
        ):
            # speculative verify windows on the int4 engine: same rationale
            # as the int8 window branch above — the jnp unpack below is
            # loop-invariant, so XLA hoists it into a full bf16 HBM copy
            # and every verify round would stream 4x the int4 bytes.
            from whisperlive_tpu.ops.attention import cross_attention_int4_window

            out = cross_attention_int4_window(
                jnp.swapaxes(q_eff, 1, 2), ckv["kv4"][0], ckv["kv4"][1],
                lengths=cross_len,
            )
            out = jnp.swapaxes(out, 1, 2).astype(dtype) * scale[1][:, 0][
                :, None
            ].astype(dtype)
            return out, None
        # fallback (CPU tests, prefill/align): unpack in jnp; kv4 is
        # head-major [2, B, H, T, hd/2] -> [B, T, H, hd]
        k = jnp.swapaxes(unpack_int4(ckv["kv4"][0]), 1, 2).astype(dtype)
        v = jnp.swapaxes(unpack_int4(ckv["kv4"][1]), 1, 2).astype(dtype)
        out, probs = _attention(q_eff, k, v, _cross_len_mask(k.shape[1], cross_len))
        out = out * scale[1][:, 0][:, None].astype(out.dtype)
        return (out, probs) if collect_probs else (out, None)

    # Unquantized path: compute_cross_kv emits scale=None here; the int8/int4
    # quantizers replace "kv" with "kv8"/"kv4". A bf16 producer with scales
    # would need the q-fold parity treatment the quantized paths got — refuse
    # rather than silently half-apply it.
    if scale is not None:
        raise ValueError("unquantized cross-KV must not carry scales")
    k, v = ckv["kv"][0], ckv["kv"][1]
    out, probs = _attention(
        qc, k.astype(dtype), v.astype(dtype), _cross_len_mask(k.shape[1], cross_len)
    )
    if collect_probs:
        return out, probs
    return out, None


def init_self_kv(cfg: WhisperConfig, batch: int, cache_len: int | None = None) -> jax.Array:
    """Zeroed self-attention KV cache [L, 2, B, cache_len, H, hd].

    cache_len defaults to the architectural max (n_text_ctx=448) but
    serving sizes it to prompt_pad + generation budget — the cache is fully
    re-read every decode step, so a 144-slot cache costs 1/3 the HBM
    traffic of a 448-slot one.
    """
    if cache_len is None:
        cache_len = cfg.n_text_ctx
    return jnp.zeros(
        (cfg.n_text_layer, 2, batch, cache_len, cfg.n_text_head, cfg.head_dim),
        cfg.dtype,
    )


def _decoder_block_step(
    x, lp, self_kv, cross_kv, slot_start, attn_mask, n_head, cross_len=None,
    collect_probs=True, active=None,
):
    """One decoder layer for Tq query tokens given caches.

    TPU-critical layout decision: new K/V land at a batch-UNIFORM cache slot
    (`slot_start`, a scalar) via `dynamic_update_slice` — never a per-item
    scatter, which lowers to a slow generic TPU scatter. Per-item prompt
    lengths are expressed purely through `attn_mask` (and the position
    embeddings chosen by the caller), not through the cache layout.

    x: [B, Tq, d]; self_kv: [2, B, C, H, hd]; cross_kv: [2, B, Tenc, H, hd];
    attn_mask: broadcastable to [B, 1, Tq, C]. Returns
    (x, updated self_kv, cross-attn probs).
    """
    # Self-attention with a uniform-slot cache write.
    h = _layer_norm(x, lp["attn_ln"])
    q = _split_heads(_linear(h, lp["attn"]["q"]), n_head)
    k_new = _split_heads(_linear(h, lp["attn"]["k"]), n_head)
    v_new = _split_heads(_linear(h, lp["attn"]["v"]), n_head)

    zero = jnp.zeros((), jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(
        self_kv[0], k_new, (zero, slot_start, zero, zero)
    )
    v_cache = jax.lax.dynamic_update_slice(
        self_kv[1], v_new, (zero, slot_start, zero, zero)
    )

    attn_out, _ = _attention(q, k_cache, v_cache, attn_mask)
    x = x + _linear(_merge_heads(attn_out), lp["attn"]["o"])

    # Cross-attention (full encoder context unless cross_len restricts it).
    h = _layer_norm(x, lp["cross_attn_ln"])
    qc = _split_heads(_linear(h, lp["cross_attn"]["q"]), n_head)
    # collect_probs=False keeps the quantized fast paths reachable (the
    # Tq-window int8 kernel cannot return attention maps); only the
    # alignment pass (decode_with_cross_attn) needs the probs.
    cross_out, cross_probs = _cross_attend(
        qc, cross_kv, x.dtype, collect_probs=collect_probs,
        cross_len=cross_len, active=active,
    )
    x = x + _linear(_merge_heads(cross_out), lp["cross_attn"]["o"])

    x = x + _mlp(_layer_norm(x, lp["mlp_ln"]), lp["mlp"])
    return x, jnp.stack([k_cache, v_cache]), cross_probs


def _decoder_forward(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, Tq] int32
    pos_idx: jax.Array,  # [B, Tq] logical positions (for position embedding)
    slot_start,  # scalar: cache slot where these Tq tokens are written
    attn_mask: jax.Array,  # broadcastable to [B, 1, Tq, C]
    self_kv: jax.Array,  # [L, 2, B, C, H, hd]
    cross_kv: jax.Array,  # [L, 2, B, Tenc, H, hd]
    collect_cross_attn: bool = False,
    cross_len: jax.Array | None = None,  # [B] valid encoder positions
    active: jax.Array | None = None,  # [B] rows whose output is discarded
):
    p = params["decoder"]
    x = _embed_lookup(p, tokens, cfg.dtype) + p["pos"].astype(cfg.dtype)[
        jnp.clip(pos_idx, 0, cfg.n_text_ctx - 1)
    ]

    def block(x, layer):
        lp, skv, ckv = layer
        x, new_skv, cross_probs = _decoder_block_step(
            x, lp, skv, ckv, slot_start, attn_mask, cfg.n_text_head,
            cross_len=cross_len, collect_probs=collect_cross_attn,
            active=active,
        )
        out = (new_skv, cross_probs) if collect_cross_attn else (new_skv, None)
        return x, out

    x, (new_self_kv, cross_attns) = jax.lax.scan(
        block, x, (p["layers"], self_kv, cross_kv)
    )
    x = _layer_norm(x, p["ln"])
    return x, new_self_kv, cross_attns


def _project_logits(params: Params, x: jax.Array) -> jax.Array:
    """Hidden states -> f32 logits via the tied token embedding.

    Operands stay in compute dtype (MXU multiplies bf16 natively with f32
    accumulation); with int8 embeddings the Pallas kernel streams half the
    bytes and dequantizes per vocab tile in VMEM.
    """
    p = params["decoder"]
    if "embed8" in p:
        if jax.default_backend() in ("tpu", "axon"):
            from whisperlive_tpu.ops.quant_matmul import int8_matmul_t

            shape = x.shape
            out = int8_matmul_t(
                x.reshape(-1, shape[-1]), p["embed8"], p["embed_s"]
            )
            return out.reshape(*shape[:-1], p["embed8"].shape[0])
        embed = p["embed8"].astype(x.dtype) * p["embed_s"][:, None].astype(x.dtype)
        return jnp.dot(x, embed.T, preferred_element_type=jnp.float32)
    embed = p["embed"]
    return jnp.dot(x, embed.T.astype(x.dtype), preferred_element_type=jnp.float32)


def decode_prefill(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, P] right-padded prompts
    prompt_len: jax.Array,  # [B] valid lengths
    self_kv: jax.Array,
    cross_kv: jax.Array,
    sot_idx: jax.Array | None = None,  # [B] position of <|sot|> in the prompt
):
    """Teacher-forced pass over right-padded prompts.

    Prompts occupy cache slots [0, P) for every item; pad-slot K/V beyond
    prompt_len[b] is garbage but is excluded from all later attention by
    the step mask (generation slots start at P — see decode_step). The
    prefill causal mask is batch-uniform (j <= i), so pad queries only ever
    read real-or-earlier-pad slots and their outputs are simply not used.

    Returns (last_logits [B, V] at position prompt_len-1, new self_kv), or —
    when `sot_idx` is given — (last_logits, sot_logits, new self_kv) where
    sot_logits are the logits emitted AT the <|sot|> position (whisper reads
    the no-speech probability there).
    """
    b, pmax = tokens.shape
    pos_idx = jnp.broadcast_to(jnp.arange(pmax)[None, :], (b, pmax))
    c = self_kv.shape[3]
    causal = (
        jnp.arange(c)[None, :] <= jnp.arange(pmax)[:, None]
    )[None, None]  # [1, 1, P, C]
    x, new_kv, _ = _decoder_forward(
        params, cfg, tokens, pos_idx, jnp.zeros((), jnp.int32), causal,
        self_kv, cross_kv,
    )
    # Project only the needed positions — avoids a [B, P, V] f32 buffer.
    last_hidden = x[jnp.arange(b), jnp.maximum(prompt_len - 1, 0)]
    last_logits = _project_logits(params, last_hidden)
    if sot_idx is None:
        return last_logits, new_kv
    sot_hidden = x[jnp.arange(b), jnp.clip(sot_idx, 0, pmax - 1)]
    return last_logits, _project_logits(params, sot_hidden), new_kv


def decode_window(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, K] window tokens (e.g. [cur, d1..dk] in verify)
    pos_idx: jax.Array,  # [B, K] logical positions of each window token
    slot_start,  # scalar int32: cache slot of tokens[:, 0]
    prompt_len: jax.Array,  # [B] true prompt lengths
    prompt_pad: int,  # static: padded prompt length (gen slots start here)
    self_kv: jax.Array,
    cross_kv: jax.Array,
):
    """Multi-token decode pass: K tokens written at cache slots
    [slot_start, slot_start + K), logits returned for ALL K positions.

    This is the speculative-decoding verify primitive: the target model
    scores every draft position in ONE MXU pass, paying the per-step HBM
    cost (cross-KV + weight reads) once per K tokens instead of once per
    token. Window query i may attend the prompt, every previously ACCEPTED
    generation slot (j < slot_start — slot validity is purely mask-based,
    so rejected speculative slots from an earlier round need no rollback:
    they sit at j >= slot_start and are overwritten by this window), and
    the window itself causally (j <= slot_start + i; the window's K/V are
    in the cache copy before attention — see _decoder_block_step).

    Returns (logits [B, K, V] f32, new self_kv).
    """
    b, kwin = tokens.shape
    c = self_kv.shape[3]
    j = jnp.arange(c)[None, None, :]  # [1, 1, C]
    i = jnp.arange(kwin)[None, :, None]  # [1, K, 1]
    mask = (j < prompt_len[:, None, None]) | (
        (j >= prompt_pad) & (j <= slot_start + i)
    )  # [B, K, C]
    x, new_kv, _ = _decoder_forward(
        params, cfg, tokens, pos_idx, slot_start, mask[:, None],
        self_kv, cross_kv,
    )
    return _project_logits(params, x), new_kv


def decode_window_masked(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, K] window tokens
    pos_idx: jax.Array,  # [B, K] logical positions of each window token
    slot_start,  # scalar int32: cache slot of tokens[:, 0]
    mask: jax.Array,  # [B, K, C] bool — cache slots each query may attend
    self_kv: jax.Array,
    cross_kv: jax.Array,
    cross_len: jax.Array | None = None,  # [B] valid encoder positions
    active: jax.Array | None = None,  # [B] rows whose output is discarded
):
    """decode_window with a caller-supplied attention mask over cache
    slots — the continuous-batching verify primitive: the ring scheduler's
    slot validity is mask-based (accepted ring columns + per-item prompt
    lengths), so the contiguous [prompt | j <= slot_start + i] mask that
    decode_window builds does not apply. Query i must be given its own
    in-window causal columns by the caller (the window's K/V are in the
    cache copy before attention). Returns (logits [B, K, V] f32, kv)."""
    x, new_kv, _ = _decoder_forward(
        params, cfg, tokens, pos_idx, slot_start, mask[:, None],
        self_kv, cross_kv, cross_len=cross_len, active=active,
    )
    return _project_logits(params, x), new_kv


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    token: jax.Array,  # [B] current token ids
    pos: jax.Array,  # [B] logical position of `token` (prompt_len + step)
    slot,  # scalar int32: uniform cache slot = prompt_pad + step
    prompt_len: jax.Array,  # [B] true prompt lengths
    prompt_pad: int,  # static: padded prompt length P (gen slots start here)
    self_kv: jax.Array,
    cross_kv: jax.Array,
):
    """Single autoregressive step with a batch-uniform cache slot.

    Valid cache slots for item b at this step: [0, prompt_len[b]) — the real
    prompt — plus [P, slot] — the generated tokens (uniform across items
    because every item samples in lockstep). Returns (logits [B, V], kv).
    """
    c = self_kv.shape[3]
    j = jnp.arange(c)[None, :]  # [1, C]
    # slots strictly before the current one; the current token attends
    # itself via the separate `new` score column below.
    mask = (j < prompt_len[:, None]) | ((j >= prompt_pad) & (j < slot))
    return decode_step_masked(
        params, cfg, token, pos, slot, mask, self_kv, cross_kv
    )


def decode_step_masked(
    params: Params,
    cfg: WhisperConfig,
    token: jax.Array,  # [B] current token ids
    pos: jax.Array,  # [B] logical position of `token`
    slot,  # scalar int32: batch-uniform cache slot to write this step's K/V
    mask: jax.Array,  # [B, C] bool — cache slots each item may attend
    self_kv: jax.Array,
    cross_kv: jax.Array,
    cross_len: jax.Array | None = None,  # [B] valid encoder positions
    active: jax.Array | None = None,  # [B] rows whose output is discarded
):
    """decode_step with a caller-supplied attention mask over cache slots.

    The continuous-batching scheduler uses this with a ring-buffer validity
    mask (each slot's generated tokens live at (global_step % ring) offsets
    since its join step); the lockstep path builds the contiguous
    prompt+generation mask in decode_step above. The write slot stays
    batch-uniform either way — the TPU-critical invariant (no per-item
    scatters).
    """
    p = params["decoder"]
    x = (
        _embed_lookup(p, token[:, None], cfg.dtype)
        + p["pos"].astype(cfg.dtype)[jnp.clip(pos[:, None], 0, cfg.n_text_ctx - 1)]
    )  # [B, 1, d]

    c = self_kv.shape[3]
    mask = mask[:, None, None, :]  # [B, 1, 1, C]
    n_head = cfg.n_text_head

    def block(carry, layer):
        x, kv = carry
        l_idx, lp, ckv = layer
        skv = jax.lax.dynamic_index_in_dim(kv, l_idx, 0, keepdims=False)

        # Self-attention over (read-only cache) ++ (this step's K/V): the
        # cache is never copied — only the one new slot is written back.
        h = _layer_norm(x, lp["attn_ln"])
        q = _split_heads(_linear(h, lp["attn"]["q"]), n_head)  # [B,1,H,hd]
        k_new = _split_heads(_linear(h, lp["attn"]["k"]), n_head)
        v_new = _split_heads(_linear(h, lp["attn"]["v"]), n_head)

        hd = q.shape[-1]
        sc_cache = jnp.einsum(
            "bqhd,bkhd->bhqk", q, skv[0], preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        sc_cache = jnp.where(mask, sc_cache, jnp.finfo(jnp.float32).min)
        sc_new = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_new, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        scores = jnp.concatenate([sc_cache, sc_new], axis=-1)  # [B,H,1,C+1]
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs[..., :c], skv[1],
            preferred_element_type=q.dtype,
        ) + jnp.einsum(
            "bhqk,bkhd->bqhd", probs[..., c:], v_new,
            preferred_element_type=q.dtype,
        )
        x = x + _linear(_merge_heads(out), lp["attn"]["o"])

        # Cross-attention (cross_len-masked for reduced-context slots;
        # inactive rows' K/V DMA skipped on the int8 kernel path).
        h = _layer_norm(x, lp["cross_attn_ln"])
        qc = _split_heads(_linear(h, lp["cross_attn"]["q"]), n_head)
        cross_out, _ = _cross_attend(
            qc, ckv, x.dtype, cross_len=cross_len, active=active
        )
        x = x + _linear(_merge_heads(cross_out), lp["cross_attn"]["o"])
        x = x + _mlp(_layer_norm(x, lp["mlp_ln"]), lp["mlp"])

        # Write back ONLY the new slot (in-place on the carried buffer).
        zero = jnp.zeros((), jnp.int32)
        kv = jax.lax.dynamic_update_slice(
            kv, jnp.stack([k_new, v_new])[None], (l_idx, zero, zero, slot, zero, zero)
        )
        return (x, kv), None

    layer_ids = jnp.arange(cfg.n_text_layer)
    (x, new_kv), _ = jax.lax.scan(
        block, (x, self_kv), (layer_ids, p["layers"], cross_kv)
    )
    x = _layer_norm(x, p["ln"])
    return _project_logits(params, x[:, 0]), new_kv


def decode_with_cross_attn(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, T] right-padded; pad queries isolated by causality
    cross_kv: jax.Array,
    cross_len: jax.Array | None = None,  # [B] valid encoder positions
):
    """Full teacher-forced pass returning cross-attention maps.

    Used for word-level timestamp alignment (the reference delegates this to
    ctranslate2 model.align, transcriber_faster_whisper.py:1657-1663; here
    the attention maps come from the same JAX program and DTW runs on host).

    Returns (logits [B, T, V], cross_attn [L, B, H, T, Tenc] float32).
    """
    b, t = tokens.shape
    # One-shot teacher-forced pass: a T-slot cache suffices (T follows the
    # caller's prompt buckets, so this stays bucketed). The architectural
    # 448-slot default would make every layer read ~7x dead cache slots.
    self_kv = init_self_kv(cfg, b, cache_len=t)
    pos_idx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    causal = (
        jnp.arange(self_kv.shape[3])[None, :] <= jnp.arange(t)[:, None]
    )[None, None]
    x, _, cross = _decoder_forward(
        params, cfg, tokens, pos_idx, jnp.zeros((), jnp.int32), causal,
        self_kv, cross_kv, collect_cross_attn=True, cross_len=cross_len,
    )
    # cross stays in compute dtype: [L, B, H, T, ctx] is large — the f32
    # upcast happens on host after slicing the alignment heads.
    return _project_logits(params, x), cross


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def quantize_decoder_weights(params: Params) -> Params:
    """Weight-only int8 quantization of the DECODER's linear layers.

    The decoder is HBM-bound (weights re-read every sampled token); int8
    with per-output-channel scales halves that traffic at near-lossless
    accuracy. The encoder (compute-bound, run once per window) and the
    tied embedding (used for both lookup and logits) stay in compute dtype.
    LayerNorms/biases are untouched.
    """

    def quant_linear(p):
        if "w" not in p:
            return p
        w = p["w"].astype(jnp.float32)  # [L, d_in, d_out] (stacked layers)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True), 1e-8) / 127.0
        w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out = {"w8": w8, "s": jnp.squeeze(s, axis=-2).astype(jnp.bfloat16)}
        if "b" in p:
            out["b"] = p["b"]
        return out

    dec = params["decoder"]
    layers = dec["layers"]
    embed = dec["embed"].astype(jnp.float32)  # [V, d]; per-row scales
    e_s = jnp.maximum(jnp.max(jnp.abs(embed), axis=1), 1e-8) / 127.0
    embed8 = jnp.clip(jnp.round(embed / e_s[:, None]), -127, 127).astype(jnp.int8)

    def is_linear(node):
        return isinstance(node, dict) and "w" in node

    new_layers = jax.tree.map(
        lambda n: quant_linear(n) if is_linear(n) else n,
        layers,
        is_leaf=is_linear,
    )
    new_dec = {k: v for k, v in dec.items() if k != "embed"}
    new_dec["layers"] = new_layers
    new_dec["embed8"] = embed8
    new_dec["embed_s"] = e_s.astype(jnp.bfloat16)
    return {"encoder": params["encoder"], "decoder": new_dec}


def dequantize_decoder_weights(params: Params, dtype=jnp.float32) -> Params:
    """Inverse of quantize_decoder_weights: rebuild DENSE decoder weights
    carrying exactly the values the serving kernels dequantize to
    (w8 * s, embed8 * embed_s — including the int8 rounding error).

    Purpose: training-path forwards (training.decoder_forward_train) can
    then reproduce the int8-SERVING decoder's numerics. Distilling a
    speculative draft against these logits optimizes agreement with the
    argmax the serving verifier actually applies — KD against the raw
    float teacher mis-targets wherever quantization flips an argmax
    (negligible for trained weights, fatal for random-weight benches).
    No-op on an unquantized tree."""

    def is_q(node):
        return isinstance(node, dict) and "w8" in node

    def deq(p):
        out = {
            "w": (
                p["w8"].astype(jnp.float32)
                * p["s"].astype(jnp.float32)[..., None, :]
            ).astype(dtype)
        }
        if "b" in p:
            out["b"] = p["b"]
        return out

    dec = params["decoder"]
    if "embed8" not in dec:
        return params
    new_dec = {k: v for k, v in dec.items() if k not in ("embed8", "embed_s")}
    new_dec["layers"] = jax.tree.map(
        lambda n: deq(n) if is_q(n) else n, dec["layers"], is_leaf=is_q
    )
    new_dec["embed"] = (
        dec["embed8"].astype(jnp.float32)
        * dec["embed_s"].astype(jnp.float32)[:, None]
    ).astype(dtype)
    return {"encoder": params["encoder"], "decoder": new_dec}


def cast_params(params: Params, dtype) -> Params:
    """Cast matmul weights to `dtype`, keep layernorm params in f32."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("scale", "bias"):
            return x.astype(jnp.float32)
        if name in ("w8", "embed8"):  # int8-quantized weights stay int8
            return x
        if name in ("s", "embed_s"):  # their per-channel scales stay compact
            return x.astype(jnp.bfloat16)
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)
