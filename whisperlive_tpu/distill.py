"""Draft distillation: produce a distil-style student decoder for
speculative serving (engine/speculative.py).

The recipe follows the public distil-whisper design (the same family the
serving catalog's distil-* sizes come from): the student SHARES the
teacher's encoder (frozen) and keeps only a few decoder layers,
initialized from maximally-spaced teacher layers; training minimizes a
word-level KL to the teacher's distribution plus cross-entropy on the
teacher's own argmax pseudo-labels. Because encoder geometry and vocab
are shared by construction, the result plugs straight into
SpeculativeDecoder as a draft.

The reference has no training at all (SURVEY §5); this extends the
framework's fine-tuning path (training.py) with the knowledge-distillation
objective. Everything is a pure jittable function over a ("data",
"model") mesh like train_step — batch sharded over data, parameters per
parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from whisperlive_tpu.models import whisper as wmod
from whisperlive_tpu.training import decoder_forward_train


def student_layer_indices(n_teacher: int, n_student: int) -> list[int]:
    """Maximally-spaced teacher layers, always including first and last
    (distil-whisper initializes the 2-layer student from teacher layers
    [0, L-1])."""
    if n_student >= n_teacher:
        return list(range(n_teacher))
    if n_student == 1:
        return [n_teacher - 1]
    return [
        round(i * (n_teacher - 1) / (n_student - 1)) for i in range(n_student)
    ]


def student_config(
    teacher_cfg: wmod.WhisperConfig, n_text_layer: int = 2
) -> wmod.WhisperConfig:
    """The distil-family shape: same encoder, same width/heads/vocab,
    fewer decoder layers (cf. distil-large-v3 = large-v3 with 2 decoder
    layers in the size catalog)."""
    return teacher_cfg.replace(n_text_layer=n_text_layer)


def init_student_from_teacher(
    teacher_params: wmod.Params, n_text_layer: int = 2
) -> wmod.Params:
    """Student params: the teacher's encoder (shared, frozen in training)
    and a decoder whose layer stack gathers maximally-spaced teacher
    layers. With n_text_layer == the teacher's layer count this is an
    exact copy (identity distillation init) — pinned by tests."""
    dec = teacher_params["decoder"]
    n_teacher = jax.tree.leaves(dec["layers"])[0].shape[0]
    idx = jnp.asarray(
        student_layer_indices(int(n_teacher), n_text_layer), jnp.int32
    )
    return {
        "encoder": teacher_params["encoder"],
        "decoder": {
            "embed": dec["embed"],
            "pos": dec["pos"],
            "layers": jax.tree.map(lambda x: jnp.take(x, idx, axis=0),
                                   dec["layers"]),
            "ln": dec["ln"],
        },
    }


def distill_loss(
    student_decoder: dict,
    teacher_params: wmod.Params,
    student_cfg: wmod.WhisperConfig,
    teacher_cfg: wmod.WhisperConfig,
    mel: jax.Array | None,  # [B, 3000, n_mels] (or None with enc given)
    tokens_in: jax.Array,  # [B, T] teacher-forced inputs
    loss_mask: jax.Array,  # [B, T] f32
    kl_weight: float = 0.8,
    ce_weight: float = 1.0,
    temperature: float = 2.0,
    enc: jax.Array | None = None,  # [B, 1500, d] precomputed encoder feats
    t_logits: jax.Array | None = None,  # [B, T, V] precomputed teacher logits
) -> jax.Array:
    """KD objective on one batch. The teacher (and the shared encoder) is
    inside stop_gradient; only the student DECODER takes gradients.

    The teacher is FROZEN, so its encoder features and teacher-forced
    logits are constants of the (clip, pseudo-label) pool — callers can
    precompute them once (scripts/distill_draft.py) and pass `enc` /
    `t_logits` to skip the dominant per-step FLOPs (a full encoder pass
    is ~8 TFLOP at large-v3; the student fwd/bwd is ~100x less)."""
    if enc is None:
        enc = jax.lax.stop_gradient(
            wmod.encode(teacher_params, teacher_cfg, mel)
        )
    if t_logits is None:
        t_logits = jax.lax.stop_gradient(
            decoder_forward_train(teacher_params, teacher_cfg, tokens_in, enc)
        )
    t_logits = t_logits.astype(jnp.float32)
    s_params = {
        "encoder": teacher_params["encoder"],
        "decoder": student_decoder,
    }
    s_logits = decoder_forward_train(s_params, student_cfg, tokens_in, enc)

    # word-level KL at temperature tau (distil-whisper eq. 2)
    t_lp = jax.nn.log_softmax(t_logits / temperature, axis=-1)
    s_lp = jax.nn.log_softmax(s_logits / temperature, axis=-1)
    kl = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)  # [B, T]

    # pseudo-label CE: the teacher's argmax is exactly what speculative
    # acceptance compares against, so optimizing it directly optimizes
    # the draft's acceptance rate
    pseudo = jnp.argmax(t_logits, axis=-1)
    ce = -jnp.take_along_axis(
        jax.nn.log_softmax(s_logits, axis=-1), pseudo[..., None], axis=-1
    )[..., 0]

    denom = jnp.maximum(jnp.sum(loss_mask), 1.0)
    return (
        kl_weight * temperature**2 * jnp.sum(kl * loss_mask)
        + ce_weight * jnp.sum(ce * loss_mask)
    ) / denom


@dataclasses.dataclass
class DistillState:
    student_decoder: dict
    opt_state: Any
    step: jax.Array


jax.tree_util.register_dataclass(
    DistillState,
    data_fields=["student_decoder", "opt_state", "step"],
    meta_fields=[],
)


def make_distill_step(
    student_cfg: wmod.WhisperConfig,
    teacher_cfg: wmod.WhisperConfig,
    optimizer: optax.GradientTransformation,
    kl_weight: float = 0.8,
    ce_weight: float = 1.0,
    temperature: float = 2.0,
):
    """(state, teacher_params, batch) -> (state, loss), jittable. Under a
    mesh, shard like training.make_train_step (teacher params with
    EngineShardings.param_shardings, batch over "data")."""

    def step(state: DistillState, teacher_params: wmod.Params, batch: dict):
        loss, grads = jax.value_and_grad(distill_loss)(
            state.student_decoder,
            teacher_params,
            student_cfg,
            teacher_cfg,
            batch.get("mel"),
            batch["tokens_in"],
            batch["loss_mask"],
            kl_weight=kl_weight,
            ce_weight=ce_weight,
            temperature=temperature,
            enc=batch.get("enc"),
            t_logits=batch.get("t_logits"),
        )
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.student_decoder
        )
        new_dec = optax.apply_updates(state.student_decoder, updates)
        return DistillState(new_dec, new_opt, state.step + 1), loss

    return step


def init_distill_state(
    teacher_params: wmod.Params,
    optimizer: optax.GradientTransformation,
    n_text_layer: int = 2,
) -> DistillState:
    student = init_student_from_teacher(teacher_params, n_text_layer)
    dec = student["decoder"]
    return DistillState(dec, optimizer.init(dec), jnp.zeros((), jnp.int32))


def student_params(
    teacher_params: wmod.Params, state: DistillState
) -> wmod.Params:
    """Assemble full draft params (shared encoder + trained decoder) —
    ready for WhisperEngine / SpeculativeDecoder or save_checkpoint."""
    return {"encoder": teacher_params["encoder"],
            "decoder": state.student_decoder}


def measure_acceptance(
    teacher_params: wmod.Params,
    student: wmod.Params,
    teacher_cfg: wmod.WhisperConfig,
    student_cfg: wmod.WhisperConfig,
    mel: np.ndarray | None,
    tokens_in: np.ndarray,
    loss_mask: np.ndarray,
    enc: np.ndarray | None = None,
) -> float:
    """Teacher-forced greedy agreement rate — the upper bound on the
    speculative acceptance this draft achieves at k=1 on this data."""
    if enc is None:
        enc = wmod.encode(teacher_params, teacher_cfg, jnp.asarray(mel))
    else:
        enc = jnp.asarray(enc)
    t = np.asarray(jnp.argmax(
        decoder_forward_train(teacher_params, teacher_cfg,
                              jnp.asarray(tokens_in), enc), axis=-1))
    s = np.asarray(jnp.argmax(
        decoder_forward_train(student, student_cfg,
                              jnp.asarray(tokens_in), enc), axis=-1))
    m = np.asarray(loss_mask) > 0
    return float((t[m] == s[m]).mean()) if m.any() else 0.0
