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
    "distil-large-v3": WhisperConfig(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 2),
}


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
    k_e, k_d, k_c1, k_c2, k_emb = jax.random.split(key, 5)
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
            "pos": jax.random.normal(k_emb, (cfg.n_text_ctx, dd), dtype) * 0.01,
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
    out = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


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
    """mel [B, 3000, n_mels] -> encoder states [B, 1500, d] (compute dtype)."""
    p = params["encoder"]
    x = mel.astype(cfg.dtype)
    x = jax.nn.gelu(_conv1d(x, p["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv2"], 2), approximate=False)
    x = x + p["pos"].astype(cfg.dtype)

    def block(x, lp):
        h, _, _ = _self_attn_full(_layer_norm(x, lp["attn_ln"]), lp["attn"], cfg.n_audio_head, None)
        x = x + h
        x = x + _mlp(_layer_norm(x, lp["mlp_ln"]), lp["mlp"])
        return x, None

    x, _ = jax.lax.scan(block, x, p["layers"])
    return _layer_norm(x, p["ln_post"])


# ---------------------------------------------------------------------------
# Decoder — KV-cached, per-item write pointers
# ---------------------------------------------------------------------------


def compute_cross_kv(params: Params, cfg: WhisperConfig, enc: jax.Array) -> jax.Array:
    """Precompute per-layer cross-attention K,V from encoder output.

    Done once per window; every subsequent decode step reads it. Shape:
    [L, 2, B, n_audio_ctx, H, hd].
    """

    def one_layer(_, lp):
        ca = lp["cross_attn"]
        k = _split_heads(_linear(enc, ca["k"]), cfg.n_text_head)
        v = _split_heads(_linear(enc, ca["v"]), cfg.n_text_head)
        return None, jnp.stack([k, v])

    _, kv = jax.lax.scan(one_layer, None, params["decoder"]["layers"])
    return kv


def init_self_kv(cfg: WhisperConfig, batch: int) -> jax.Array:
    """Zeroed self-attention KV cache [L, 2, B, n_text_ctx, H, hd]."""
    return jnp.zeros(
        (cfg.n_text_layer, 2, batch, cfg.n_text_ctx, cfg.n_text_head, cfg.head_dim),
        cfg.dtype,
    )


def _decoder_block_step(x, lp, self_kv, cross_kv, pos_idx, n_head, cache_len):
    """One decoder layer for Tq query tokens given caches.

    x: [B, Tq, d]; self_kv: [2, B, C, H, hd]; cross_kv: [2, B, Tenc, H, hd];
    pos_idx: [B, Tq] absolute positions of the query tokens (for causal mask
    and cache writes). Returns (x, updated self_kv, cross-attn probs).
    """
    b, tq, d = x.shape

    # Self-attention with cache write at per-item positions.
    h = _layer_norm(x, lp["attn_ln"])
    q = _split_heads(_linear(h, lp["attn"]["q"]), n_head)
    k_new = _split_heads(_linear(h, lp["attn"]["k"]), n_head)
    v_new = _split_heads(_linear(h, lp["attn"]["v"]), n_head)

    # Scatter new K,V into the cache at (batch, pos_idx).
    bidx = jnp.arange(b)[:, None]
    k_cache = self_kv[0].at[bidx, pos_idx].set(k_new)
    v_cache = self_kv[1].at[bidx, pos_idx].set(v_new)

    # Mask: query at abs position p attends to cache slots <= p.
    slot = jnp.arange(cache_len)[None, None, None, :]  # [1,1,1,C]
    mask = slot <= pos_idx[:, None, :, None]  # [B,1,Tq,C]
    attn_out, _ = _attention(q, k_cache, v_cache, mask)
    x = x + _linear(_merge_heads(attn_out), lp["attn"]["o"])

    # Cross-attention (full encoder context, no mask).
    h = _layer_norm(x, lp["cross_attn_ln"])
    qc = _split_heads(_linear(h, lp["cross_attn"]["q"]), n_head)
    cross_out, cross_probs = _attention(qc, cross_kv[0], cross_kv[1], None)
    x = x + _linear(_merge_heads(cross_out), lp["cross_attn"]["o"])

    x = x + _mlp(_layer_norm(x, lp["mlp_ln"]), lp["mlp"])
    return x, jnp.stack([k_cache, v_cache]), cross_probs


def _decoder_forward(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, Tq] int32
    pos_idx: jax.Array,  # [B, Tq] absolute positions
    self_kv: jax.Array,  # [L, 2, B, C, H, hd]
    cross_kv: jax.Array,  # [L, 2, B, Tenc, H, hd]
    collect_cross_attn: bool = False,
):
    p = params["decoder"]
    embed = p["embed"].astype(cfg.dtype)
    x = embed[tokens] + p["pos"].astype(cfg.dtype)[jnp.clip(pos_idx, 0, cfg.n_text_ctx - 1)]

    def block(x, layer):
        lp, skv, ckv = layer
        x, new_skv, cross_probs = _decoder_block_step(
            x, lp, skv, ckv, pos_idx, cfg.n_text_head, cfg.n_text_ctx
        )
        out = (new_skv, cross_probs) if collect_cross_attn else (new_skv, None)
        return x, out

    x, (new_self_kv, cross_attns) = jax.lax.scan(
        block, x, (p["layers"], self_kv, cross_kv)
    )
    x = _layer_norm(x, p["ln"])
    return x, new_self_kv, cross_attns


def _project_logits(params: Params, x: jax.Array) -> jax.Array:
    """Hidden states -> f32 logits via the tied token embedding."""
    embed = params["decoder"]["embed"]
    return jnp.dot(
        x.astype(jnp.float32), embed.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


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

    Positions run 0..P-1 for every item; padded tail slots beyond
    prompt_len[b] write garbage K,V at positions >= prompt_len which are
    later OVERWRITTEN by the autoregressive loop (write pointer starts at
    prompt_len), so no masking of the tail is needed.

    Returns (last_logits [B, V] at position prompt_len-1, new self_kv), or —
    when `sot_idx` is given — (last_logits, sot_logits, new self_kv) where
    sot_logits are the logits emitted AT the <|sot|> position (whisper reads
    the no-speech probability there).
    """
    b, pmax = tokens.shape
    pos_idx = jnp.broadcast_to(jnp.arange(pmax)[None, :], (b, pmax))
    x, new_kv, _ = _decoder_forward(params, cfg, tokens, pos_idx, self_kv, cross_kv)
    # Project only the needed positions — avoids a [B, P, V] f32 buffer.
    last_hidden = x[jnp.arange(b), jnp.maximum(prompt_len - 1, 0)]
    last_logits = _project_logits(params, last_hidden)
    if sot_idx is None:
        return last_logits, new_kv
    sot_hidden = x[jnp.arange(b), jnp.clip(sot_idx, 0, pmax - 1)]
    return last_logits, _project_logits(params, sot_hidden), new_kv


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    token: jax.Array,  # [B] current token ids
    pos: jax.Array,  # [B] absolute position of `token`
    self_kv: jax.Array,
    cross_kv: jax.Array,
):
    """Single autoregressive step. Returns (logits [B, V], new self_kv)."""
    x, new_kv, _ = _decoder_forward(
        params, cfg, token[:, None], pos[:, None], self_kv, cross_kv
    )
    return _project_logits(params, x[:, 0]), new_kv


def decode_with_cross_attn(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, T]
    prompt_len: jax.Array,  # [B]
    cross_kv: jax.Array,
):
    """Full teacher-forced pass returning cross-attention maps.

    Used for word-level timestamp alignment (the reference delegates this to
    ctranslate2 model.align, transcriber_faster_whisper.py:1657-1663; here
    the attention maps come from the same JAX program and DTW runs on host).

    Returns (logits [B, T, V], cross_attn [L, B, H, T, Tenc] float32).
    """
    b, t = tokens.shape
    self_kv = init_self_kv(cfg, b)
    pos_idx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x, _, cross = _decoder_forward(
        params, cfg, tokens, pos_idx, self_kv, cross_kv, collect_cross_attn=True
    )
    # cross stays in compute dtype: [L, B, H, T, ctx] is large — the f32
    # upcast happens on host after slicing the alignment heads.
    return _project_logits(params, x), cross


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cast_params(params: Params, dtype) -> Params:
    """Cast matmul weights to `dtype`, keep layernorm params in f32."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("scale", "bias"):
            return x.astype(jnp.float32)
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)
