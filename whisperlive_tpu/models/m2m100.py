"""Functional JAX M2M100/SMALL100 — the translation model on TPU.

The reference translates committed segments with SMALL100 (an M2M100
variant) through torch on CPU (whisper_live/backend/translation_backend.py).
This port runs the same checkpoints as jitted XLA programs so translation
shares the TPU with transcription instead of competing for the host core.

Architecture (HF M2M100ForConditionalGeneration conventions, verified by
the parity test in tests/test_m2m100.py):
  * shared token embedding scaled by sqrt(d_model); tied lm_head
  * fairseq-style sinusoidal positions with offset 2 (padding_idx = 1,
    unpadded position i embeds as table[i + 2])
  * pre-norm transformer, ReLU MLP, all attention projections biased
  * final layer_norm on both encoder and decoder
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from whisperlive_tpu.models.whisper import (
    _attention,
    _layer_norm,
    _linear,
    _merge_heads,
    _split_heads,
)

Params = Any

_NEG = float(np.finfo(np.float32).min) / 4  # headroom for score arithmetic


@dataclasses.dataclass(frozen=True)
class M2M100Config:
    vocab_size: int = 128112
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 1024
    pad_token_id: int = 1
    eos_token_id: int = 2
    dtype: Any = jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def config_from_hf(hf: Mapping[str, Any]) -> M2M100Config:
    return M2M100Config(
        vocab_size=hf["vocab_size"],
        d_model=hf["d_model"],
        encoder_layers=hf["encoder_layers"],
        decoder_layers=hf["decoder_layers"],
        heads=hf["encoder_attention_heads"],
        ffn_dim=hf["encoder_ffn_dim"],
        max_positions=hf.get("max_position_embeddings", 1024),
        pad_token_id=hf.get("pad_token_id", 1),
        eos_token_id=hf.get("eos_token_id", 2),
    )


def sinusoidal_positions(n_positions: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq/M2M100 sinusoid table (cat[sin, cos], padding row zeroed)."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = np.arange(n_positions)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2:
        table = np.concatenate([table, np.zeros((n_positions, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


# ---------------------------------------------------------------------------
# Conversion
# ---------------------------------------------------------------------------


def params_from_state_dict(sd: Mapping[str, Any], cfg: M2M100Config) -> Params:
    # HF-block conversion helpers are shared with the Whisper converter
    # (models/convert.py) — M2M100 differs only in the k-projection bias.
    from whisperlive_tpu.models.convert import _block_params, _ln_params as _ln_p, _t

    sd = dict(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks)

    enc = [
        _block_params(sd, f"encoder.layers.{i}", cross=False, k_bias=True)
        for i in range(cfg.encoder_layers)
    ]
    dec = [
        _block_params(sd, f"decoder.layers.{i}", cross=True, k_bias=True)
        for i in range(cfg.decoder_layers)
    ]
    return {
        "embed": jnp.asarray(_t(sd["shared.weight"])),
        "pos": jnp.asarray(
            sinusoidal_positions(cfg.max_positions + 2, cfg.d_model, cfg.pad_token_id)
        ),
        "encoder": {
            "layers": stack(enc),
            "ln": _ln_p(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "layers": stack(dec),
            "ln": _ln_p(sd, "decoder.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _block(x, lp, heads, mask=None, enc=None, enc_mask=None):
    h = _layer_norm(x, lp["attn_ln"])
    q = _split_heads(_linear(h, lp["attn"]["q"]), heads)
    k = _split_heads(_linear(h, lp["attn"]["k"]), heads)
    v = _split_heads(_linear(h, lp["attn"]["v"]), heads)
    out, _ = _attention(q, k, v, mask)
    x = x + _linear(_merge_heads(out), lp["attn"]["o"])
    if enc is not None:
        h = _layer_norm(x, lp["cross_attn_ln"])
        qc = _split_heads(_linear(h, lp["cross_attn"]["q"]), heads)
        kc = _split_heads(_linear(enc, lp["cross_attn"]["k"]), heads)
        vc = _split_heads(_linear(enc, lp["cross_attn"]["v"]), heads)
        out, _ = _attention(qc, kc, vc, enc_mask)
        x = x + _linear(_merge_heads(out), lp["cross_attn"]["o"])
    h = _layer_norm(x, lp["mlp_ln"])
    h = _linear(jax.nn.relu(_linear(h, lp["mlp"]["fc1"])), lp["mlp"]["fc2"])
    return x + h


def _embed(params, cfg, tokens, positions):
    scale = jnp.asarray(np.sqrt(cfg.d_model), cfg.dtype)
    x = params["embed"].astype(cfg.dtype)[tokens] * scale
    # fairseq offset-2 positions for unpadded sequences
    return x + params["pos"].astype(cfg.dtype)[positions + 2]


def encode(
    params: Params, cfg: M2M100Config, tokens: jax.Array,
    pad_mask: jax.Array | None = None,
) -> jax.Array:
    """tokens [B, T]; pad_mask [B, T] bool (True = real token). With a mask,
    padded key positions are excluded from self-attention (bucket-padded
    inputs stay numerically identical to unpadded ones)."""
    b, t = tokens.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = _embed(params, cfg, tokens, pos)
    mask = None if pad_mask is None else pad_mask[:, None, None, :]

    def body(x, lp):
        return _block(x, lp, cfg.heads, mask=mask), None

    x, _ = jax.lax.scan(body, x, params["encoder"]["layers"])
    return _layer_norm(x, params["encoder"]["ln"])


def decode(
    params: Params, cfg: M2M100Config, tokens: jax.Array, enc: jax.Array,
    enc_mask: jax.Array | None = None,
):
    """Teacher-forced decoder pass -> logits [B, T, V]."""
    b, t = tokens.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = _embed(params, cfg, tokens, pos)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    emask = None if enc_mask is None else enc_mask[:, None, None, :]

    def body(x, lp):
        return _block(x, lp, cfg.heads, mask=causal, enc=enc, enc_mask=emask), None

    x, _ = jax.lax.scan(body, x, params["decoder"]["layers"])
    x = _layer_norm(x, params["decoder"]["ln"])
    return jnp.dot(
        x, params["embed"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )


def _compute_cross_kv(params, cfg, enc):
    """Per-layer cross K/V from the encoder output: [L, 2, B, Tsrc, H, hd]."""

    def one(_, lp):
        ca = lp["cross_attn"]
        k = _split_heads(_linear(enc, ca["k"]), cfg.heads)
        v = _split_heads(_linear(enc, ca["v"]), cfg.heads)
        return None, jnp.stack([k, v])

    _, kv = jax.lax.scan(one, None, params["decoder"]["layers"])
    return kv


def _cached_forward(params, cfg, tokens, pos_idx, slot, self_kv, cross_kv, enc_mask):
    """Decoder forward writing K/V at batch-uniform cache slots (the same
    lockstep layout as the Whisper decoder: positions are uniform here since
    every beamless generation starts from the same [eos, lang] length)."""
    x = _embed(params, cfg, tokens, pos_idx)
    b, tq, _ = x.shape
    c = self_kv.shape[3]
    causal = (
        jnp.arange(c)[None, :] <= (pos_idx[:, :, None])
    )[:, None]  # [B, 1, Tq, C]
    emask = None if enc_mask is None else enc_mask[:, None, None, :]
    zero = jnp.zeros((), jnp.int32)

    def block(carry, layer):
        x, kv, l_idx = carry[0], carry[1], carry[2]
        lp, ckv = layer
        skv = jax.lax.dynamic_index_in_dim(kv, l_idx, 0, keepdims=False)
        h = _layer_norm(x, lp["attn_ln"])
        q = _split_heads(_linear(h, lp["attn"]["q"]), cfg.heads)
        k_new = _split_heads(_linear(h, lp["attn"]["k"]), cfg.heads)
        v_new = _split_heads(_linear(h, lp["attn"]["v"]), cfg.heads)
        k_cache = jax.lax.dynamic_update_slice(skv[0], k_new, (zero, slot, zero, zero))
        v_cache = jax.lax.dynamic_update_slice(skv[1], v_new, (zero, slot, zero, zero))
        out, _ = _attention(q, k_cache, v_cache, causal)
        x = x + _linear(_merge_heads(out), lp["attn"]["o"])

        h = _layer_norm(x, lp["cross_attn_ln"])
        qc = _split_heads(_linear(h, lp["cross_attn"]["q"]), cfg.heads)
        out, _ = _attention(qc, ckv[0], ckv[1], emask)
        x = x + _linear(_merge_heads(out), lp["cross_attn"]["o"])

        h = _layer_norm(x, lp["mlp_ln"])
        x = x + _linear(jax.nn.relu(_linear(h, lp["mlp"]["fc1"])), lp["mlp"]["fc2"])

        kv = jax.lax.dynamic_update_slice(
            kv, jnp.stack([k_cache, v_cache])[None], (l_idx, 0, 0, 0, 0, 0)
        )
        return (x, kv, l_idx + 1), None

    (x, self_kv, _), _ = jax.lax.scan(
        block, (x, self_kv, jnp.int32(0)), (params["decoder"]["layers"], cross_kv)
    )
    x = _layer_norm(x, params["decoder"]["ln"])
    logits = jnp.dot(
        x, params["embed"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return logits, self_kv


def generate_greedy(
    params: Params,
    cfg: M2M100Config,
    src_tokens: jax.Array,  # [B, T_src]
    forced_bos: jax.Array | None,  # [B] target-language token id, or None
    max_new: int = 200,
) -> jax.Array:
    """KV-cached greedy generation -> [B, max_new] (eos-padded).

    Decoder input starts [eos, lang] (HF decoder_start_token_id = eos);
    prefill writes those two cache slots, then one cached step per token —
    O(len) decoder work instead of the O(len^2) full-recompute loop.

    forced_bos=None starts the decoder with [eos] only — the SMALL100
    convention, where the target language rides the SOURCE sequence and no
    decoder token is forced (reference tokenization_small100.py:339-346 +
    translation_backend.py:90-93).
    """
    b = src_tokens.shape[0]
    src_mask = src_tokens != cfg.pad_token_id
    enc = encode(params, cfg, src_tokens, pad_mask=src_mask)
    cross_kv = _compute_cross_kv(params, cfg, enc)

    cache_len = max_new + 2
    self_kv = jnp.zeros(
        (cfg.decoder_layers, 2, b, cache_len, cfg.heads, cfg.d_model // cfg.heads),
        enc.dtype,
    )
    if forced_bos is None:
        prefix = jnp.full((b, 1), cfg.eos_token_id, jnp.int32)
    else:
        prefix = jnp.stack(
            [jnp.full((b,), cfg.eos_token_id, jnp.int32), forced_bos.astype(jnp.int32)],
            axis=1,
        )  # [B, 2]
    plen = prefix.shape[1]
    pos01 = jnp.broadcast_to(jnp.arange(plen)[None], (b, plen))
    logits, self_kv = _cached_forward(
        params, cfg, prefix, pos01, jnp.int32(0), self_kv, cross_kv, src_mask
    )
    buf = jnp.full((b, max_new), cfg.pad_token_id, jnp.int32)
    first = jnp.argmax(logits[:, plen - 1], axis=-1).astype(jnp.int32)
    buf = buf.at[:, 0].set(first)
    done = first == cfg.eos_token_id

    def body(carry):
        # The previous token rides the loop carry (`cur`) — re-reading it
        # from `buf` would be a per-item gather inside the hot while_loop
        # (lockstep invariant: batch-uniform buffer ops only).
        buf, cur, i, done, self_kv = carry
        pos = jnp.full((b, 1), i + plen - 1, jnp.int32)
        logits, self_kv = _cached_forward(
            params, cfg, cur[:, None], pos, i + plen - 1, self_kv, cross_kv, src_mask
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        buf = buf.at[:, i].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return buf, nxt, i + 1, done, self_kv

    def cond(carry):
        _, _, i, done, _ = carry
        return (i < max_new) & ~jnp.all(done)

    buf, _, _, _, _ = jax.lax.while_loop(
        cond, body, (buf, first, jnp.int32(1), done, self_kv)
    )
    return buf


def generate_beam(
    params: Params,
    cfg: M2M100Config,
    src_tokens: jax.Array,  # [B, T_src]
    forced_bos: jax.Array | None,  # [B] target-language token id, or None
    max_new: int = 200,
    beam_size: int = 5,
    length_penalty: float = 1.0,
) -> jax.Array:
    """KV-cached beam search -> [B, max_new] (eos-terminated, pad-filled).

    Matches Hugging Face `generate()` beam semantics with
    early_stopping=True — the M2M100/SMALL100 generation-config defaults
    the reference translates with (translation_backend.py:92 calls bare
    `generate()`, m2m100 config: num_beams=5, early_stopping=True):
      * top-2K candidate expansion per step; EOS candidates ranked below
        K are discarded, ranked within K enter the finished pool scored
        sum_logprobs / hyp_len**length_penalty (hyp_len EXCLUDING the
        EOS, INCLUDING the decoder-start prefix);
      * the K best non-EOS candidates continue (parent gather of the
        self-KV cache);
      * an item stops once its pool holds K hypotheses; unfinished beams
        enter the pool at finalize;
      * output is the best pooled hypothesis per item.
    """
    b = src_tokens.shape[0]
    k = beam_size
    bk = b * k
    eos = cfg.eos_token_id
    pad = cfg.pad_token_id
    src_mask = src_tokens != cfg.pad_token_id
    enc = encode(params, cfg, src_tokens, pad_mask=src_mask)
    cross_kv_b = _compute_cross_kv(params, cfg, enc)

    cache_len = max_new + 2
    hd = cfg.d_model // cfg.heads
    self_kv_b = jnp.zeros(
        (cfg.decoder_layers, 2, b, cache_len, cfg.heads, hd), enc.dtype
    )
    if forced_bos is None:
        prefix = jnp.full((b, 1), eos, jnp.int32)
    else:
        prefix = jnp.stack(
            [jnp.full((b,), eos, jnp.int32), forced_bos.astype(jnp.int32)],
            axis=1,
        )
    plen = prefix.shape[1]
    pos01 = jnp.broadcast_to(jnp.arange(plen)[None], (b, plen))
    logits_b, self_kv_b = _cached_forward(
        params, cfg, prefix, pos01, jnp.int32(0), self_kv_b, cross_kv_b,
        src_mask,
    )

    def tile(x, axis):
        return jnp.repeat(x, k, axis=axis)

    self_kv = tile(self_kv_b, 2)
    cross_kv = tile(cross_kv_b, 2)
    src_mask_bk = tile(src_mask, 0)
    logits = tile(logits_b[:, plen - 1], 0)  # [BK, V]
    # lane 0 carries the live score; duplicates start at -inf (HF init)
    sum_lp = jnp.tile(
        jnp.concatenate([jnp.zeros(1), jnp.full((k - 1,), _NEG)]), b
    )
    buf = jnp.full((bk, max_new), pad, jnp.int32)
    pool_scores = jnp.full((b, k), _NEG, jnp.float32)
    pool_toks = jnp.full((b, k, max_new), pad, jnp.int32)
    item_done = jnp.zeros((b,), bool)
    v = cfg.vocab_size
    rows = jnp.arange(b)

    def pool_insert(pool_scores, pool_toks, cand_scores, cand_toks, allow):
        """Keep the best K of (pool ++ candidates). cand_scores [B, C]
        (-inf where not allowed), cand_toks [B, C, L]."""
        cand_scores = jnp.where(allow, cand_scores, _NEG)
        all_scores = jnp.concatenate([pool_scores, cand_scores], axis=1)
        all_toks = jnp.concatenate([pool_toks, cand_toks], axis=1)
        top, idx = jax.lax.top_k(all_scores, k)
        return top, all_toks[rows[:, None], idx]

    def body(carry):
        (buf, i, sum_lp, self_kv, logits, pool_scores, pool_toks,
         item_done) = carry
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = (sum_lp[:, None] + lp).reshape(b, k * v)
        scores2, idx2 = jax.lax.top_k(cand, 2 * k)  # [B, 2K] desc
        parent2 = idx2 // v  # local lane
        tok2 = (idx2 % v).astype(jnp.int32)
        is_eos2 = tok2 == eos

        # --- finished-pool inserts: EOS candidates ranked within K
        hyp_len = (plen + i).astype(jnp.float32)
        cand_pool = scores2 / hyp_len**length_penalty
        allow = is_eos2 & (jnp.arange(2 * k)[None, :] < k) & ~item_done[:, None]
        hist2 = buf.reshape(b, k, max_new)[rows[:, None], parent2]  # [B,2K,L]
        # the finished hypothesis ends with EOS at position i, pad after
        col = jnp.arange(max_new)[None, None, :]
        hist2 = jnp.where(col == i, eos, jnp.where(col < i, hist2, pad))
        pool_scores, pool_toks = pool_insert(
            pool_scores, pool_toks, cand_pool, hist2, allow
        )
        item_done = item_done | (
            jnp.sum(pool_scores > _NEG / 2, axis=1) >= k
        )

        # --- continuing beams: best K non-EOS of the 2K
        cont = jnp.where(is_eos2, _NEG, scores2)
        top_cont, cont_idx = jax.lax.top_k(cont, k)  # [B, K] -> idx into 2K
        parent_k = parent2[rows[:, None], cont_idx] + (rows * k)[:, None]
        tok_k = tok2[rows[:, None], cont_idx]
        done_rows = jnp.repeat(item_done, k)
        ident = jnp.arange(bk)
        parent = jnp.where(done_rows, ident, parent_k.reshape(bk))
        tok = jnp.where(done_rows, pad, tok_k.reshape(bk))
        sum_lp = jnp.where(done_rows, sum_lp, top_cont.reshape(bk))
        gathered = buf[parent]
        # done rows gathered pad here anyway (tok is pad for them too)
        buf = gathered.at[:, i].set(tok)
        self_kv = jnp.take(self_kv, parent, axis=2)

        pos = jnp.full((bk, 1), i + plen, jnp.int32)
        logits, self_kv = _cached_forward(
            params, cfg, tok[:, None], pos, i + plen, self_kv, cross_kv,
            src_mask_bk,
        )
        return (buf, i + 1, sum_lp, self_kv, logits[:, 0], pool_scores,
                pool_toks, item_done)

    def cond(carry):
        _, i, _, _, _, _, _, item_done = carry
        return (i < max_new) & ~jnp.all(item_done)

    (buf, i_fin, sum_lp, _, _, pool_scores, pool_toks, item_done) = (
        jax.lax.while_loop(
            cond, body,
            (buf, jnp.int32(0), sum_lp, self_kv, logits, pool_scores,
             pool_toks, item_done),
        )
    )

    # finalize: live beams of unfinished items enter the pool (HF
    # finalize semantics: scored at the final length)
    live_len = (plen + i_fin).astype(jnp.float32)
    live_scores = (sum_lp / live_len**length_penalty).reshape(b, k)
    live_toks = buf.reshape(b, k, max_new)
    pool_scores, pool_toks = pool_insert(
        pool_scores, pool_toks, live_scores, live_toks, ~item_done[:, None]
    )
    best = jnp.argmax(pool_scores, axis=1)
    return pool_toks[rows, best]
