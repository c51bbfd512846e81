"""Whisper fine-tuning on TPU meshes (DP + TP via pjit).

The reference is inference-only (SURVEY §5: "no training, no checkpointing");
this framework adds a first-class fine-tuning path because TPU deployments
routinely adapt Whisper to domain audio. One jitted `train_step` over a
("data", "model") mesh: batch sharded over data, parameters tensor-sharded
per parallel/mesh.py, gradients reduced by XLA-inserted collectives. Layer
blocks are rematerialized (jax.checkpoint) so large-v3 fits HBM at useful
batch sizes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.ops import mel as mel_ops


def decoder_forward_train(
    params: wmod.Params,
    cfg: wmod.WhisperConfig,
    tokens: jax.Array,  # [B, T] teacher-forced inputs
    enc: jax.Array,  # [B, 1500, d]
) -> jax.Array:
    """Cache-free causal decoder forward -> logits [B, T, V] (f32).

    Unlike the serving path (which carries a 448-slot KV cache), training
    uses plain causal attention over the actual sequence length, with each
    block rematerialized.
    """
    p = params["decoder"]
    b, t = tokens.shape
    embed = p["embed"].astype(cfg.dtype)
    x = embed[tokens] + p["pos"].astype(cfg.dtype)[:t]

    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    n_head = cfg.n_text_head

    def block(x, lp):
        h = wmod._layer_norm(x, lp["attn_ln"])
        attn_out, _, _ = wmod._self_attn_full(h, lp["attn"], n_head, causal)
        x = x + attn_out
        h = wmod._layer_norm(x, lp["cross_attn_ln"])
        q = wmod._split_heads(wmod._linear(h, lp["cross_attn"]["q"]), n_head)
        k = wmod._split_heads(wmod._linear(enc, lp["cross_attn"]["k"]), n_head)
        v = wmod._split_heads(wmod._linear(enc, lp["cross_attn"]["v"]), n_head)
        out, _ = wmod._attention(q, k, v, None)
        x = x + wmod._linear(wmod._merge_heads(out), lp["cross_attn"]["o"])
        x = x + wmod._mlp(wmod._layer_norm(x, lp["mlp_ln"]), lp["mlp"])
        return x, None

    x, _ = jax.lax.scan(jax.checkpoint(block), x, p["layers"])
    x = wmod._layer_norm(x, p["ln"])
    return wmod._project_logits(params, x)


def whisper_loss(
    params: wmod.Params,
    cfg: wmod.WhisperConfig,
    mel: jax.Array,  # [B, 3000, n_mels]
    tokens_in: jax.Array,  # [B, T]
    tokens_out: jax.Array,  # [B, T] shifted targets
    loss_mask: jax.Array,  # [B, T] f32 (0 on padding/prompt)
) -> jax.Array:
    enc = wmod.encode(params, cfg, mel)
    logits = decoder_forward_train(params, cfg, tokens_in, enc)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, tokens_out[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)


@dataclasses.dataclass
class TrainState:
    params: wmod.Params
    opt_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def make_train_step(cfg: wmod.WhisperConfig, optimizer: optax.GradientTransformation):
    """Returns a jittable (state, batch) -> (state, loss) step.

    Under a mesh, shard `state.params` with EngineShardings.param_shardings
    and the batch with batch_sharding before jitting; XLA inserts the
    data-parallel psum and tensor-parallel collectives.
    """

    def train_step(state: TrainState, batch: dict):
        loss, grads = jax.value_and_grad(whisper_loss)(
            state.params,
            cfg,
            batch["mel"],
            batch["tokens_in"],
            batch["tokens_out"],
            batch["loss_mask"],
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    return train_step


def init_train_state(
    cfg: wmod.WhisperConfig,
    optimizer: optax.GradientTransformation,
    params: Optional[wmod.Params] = None,
    seed: int = 0,
) -> TrainState:
    if params is None:
        params = wmod.init_params(cfg, seed)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def save_checkpoint(path: str, state: TrainState, cfg: wmod.WhisperConfig) -> None:
    """Persist params + optimizer state + step with orbax (the reference has
    no checkpointing at all; SURVEY §5 'checkpoint/resume: none')."""
    import dataclasses as dc
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "params"), state.params, force=True)
    ckpt.save(os.path.join(path, "opt_state"), state.opt_state, force=True)
    meta = {k: v for k, v in dc.asdict(cfg).items()
            if k not in ("dtype", "fused_encoder_attention")}
    meta["step"] = int(state.step)
    # multi-host: orbax's array save above is collective (all processes
    # call it; shards stream from their owning hosts), but the metadata
    # file is plain IO — primary writes it once
    if jax.process_index() == 0:
        with open(os.path.join(path, "train_meta.json"), "w") as f:
            json.dump(meta, f)


def load_checkpoint(
    path: str, optimizer: optax.GradientTransformation
) -> tuple[TrainState, wmod.WhisperConfig]:
    """Restore a training checkpoint; opt_state structure comes from the
    optimizer re-initialized on the restored params (orbax restores leaves
    into that skeleton)."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "train_meta.json")) as f:
        meta = json.load(f)
    step = meta.pop("step")
    cfg = wmod.WhisperConfig(**meta)
    ckpt = ocp.PyTreeCheckpointer()
    import numpy as np

    # restore as plain host arrays: a checkpoint written by a multi-host
    # run carries per-array sharding metadata naming a mesh that does not
    # exist in the restoring process — forcing np.ndarray sidesteps it
    # (the caller re-shards for its own topology)
    p_skel = jax.eval_shape(lambda: wmod.init_params(cfg, 0))
    params = ckpt.restore(
        os.path.join(path, "params"),
        args=ocp.args.PyTreeRestore(
            restore_args=jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), p_skel
            ),
            item=p_skel,
        ),
    )

    skeleton = jax.eval_shape(optimizer.init, params)
    opt_state = ckpt.restore(
        os.path.join(path, "opt_state"),
        args=ocp.args.PyTreeRestore(
            restore_args=jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), skeleton
            ),
            item=skeleton,
        ),
    )
    return TrainState(params, opt_state, jnp.asarray(step, jnp.int32)), cfg

