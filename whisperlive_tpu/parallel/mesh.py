"""jax.sharding meshes and partition specs for multi-chip serving/training.

The reference has NO model parallelism (SURVEY §5: TRT-LLM is pinned to
world_size=1, CTranslate2 multi-GPU is unused) — scaling is N threads on one
GPU. Here scale-out is native: a 2-D `Mesh` with axes ("data", "model");
tensor parallelism shards attention heads and MLP hidden dims over "model"
(collectives ride ICI via XLA's sharding propagation — no hand-written
NCCL analogue), and batch/data parallelism shards the batch over "data".

Sharding rules (Megatron-style, applied to the stacked-layer pytree):
    q/k/v projections  [.., d, d]    -> shard output columns  P(..., None, "model")
    output projection  [.., d, d]    -> shard input rows       P(..., "model", None)
    mlp fc1            [.., d, 4d]   -> shard columns
    mlp fc2            [.., 4d, d]   -> shard rows
    embeddings / layernorms / convs  -> replicated
Head-dependent dims require n_heads % tp == 0.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_mesh(
    tp: int = 1, dp: Optional[int] = None, devices=None
) -> Mesh:
    """Create a ("data", "model") mesh over the local devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def _param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one parameter leaf, by its pytree path."""
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    ndim = leaf.ndim

    def with_layer_prefix(spec_tail: tuple) -> P:
        # stacked layers carry a leading L axis (never sharded)
        pad = ndim - len(spec_tail)
        return P(*([None] * pad + list(spec_tail)))

    if "layers" in names:
        leaf_name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        grandparent = names[-3] if len(names) >= 3 else ""
        if grandparent in ("attn", "cross_attn") or parent in ("attn", "cross_attn"):
            # names like (..., 'attn', 'q', 'w')
            proj = parent if parent in ("q", "k", "v", "o") else leaf_name
            if leaf_name == "w":
                if proj == "o":
                    return with_layer_prefix(("model", None))
                return with_layer_prefix((None, "model"))
            if leaf_name == "b":
                if proj == "o":
                    return P(*([None] * ndim))
                return with_layer_prefix(("model",))
        if parent in ("fc1", "fc2"):
            if leaf_name == "w":
                if parent == "fc1":
                    return with_layer_prefix((None, "model"))
                return with_layer_prefix(("model", None))
            if leaf_name == "b":
                if parent == "fc1":
                    return with_layer_prefix(("model",))
                return P(*([None] * ndim))
    # everything else (embeddings, conv stems, layernorms, positions): replicate
    return P(*([None] * ndim))


class EngineShardings:
    """Bundle of mesh + partition specs used by the engine and trainer."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    @classmethod
    def create(cls, tp: int = 1, dp: Optional[int] = None, devices=None) -> "EngineShardings":
        return cls(make_mesh(tp=tp, dp=dp, devices=devices))

    @property
    def tp(self) -> int:
        return self.mesh.shape["model"]

    @property
    def dp(self) -> int:
        return self.mesh.shape["data"]

    def param_shardings(self, params):
        """NamedSharding pytree matching the whisper parameter pytree."""
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(self.mesh, _param_spec(path, leaf)),
            params,
        )

    def batch_sharding(self, ndim: int, batch_axis: int = 0) -> NamedSharding:
        spec = [None] * ndim
        spec[batch_axis] = "data"
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def kv_sharding(self) -> NamedSharding:
        """[L, 2, B, T, H, hd]: batch over data, heads over model."""
        return NamedSharding(self.mesh, P(None, None, "data", None, "model", None))

    def validate(self, cfg) -> None:
        tp = self.tp
        if cfg.n_audio_head % tp or cfg.n_text_head % tp:
            raise ValueError(
                f"tp={tp} must divide attention heads "
                f"({cfg.n_audio_head} enc / {cfg.n_text_head} dec)"
            )
