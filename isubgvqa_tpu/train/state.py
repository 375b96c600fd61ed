"""Train state: one pytree holding everything a step mutates.

Replaces the reference's scattered mutable state — model params
(DDP-wrapped module), optimizer/scheduler state (``main.py:106-122``),
BatchNorm running stats, and the AIMLE target distribution's *Python
object* state (``target_aimle.py:100-161``), which here is an explicit
field threaded through the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct

from ..config import Config
from ..data.batching import GraphBatch
from ..models.build import init_model, make_aimle_states
from ..models.isubgvqa import ISubGVQA


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: optax.OptState
    batch_stats: Any
    aimle_states: Optional[dict]

    def replace_(self, **kw) -> "TrainState":
        return self.replace(**kw)


def create_train_state(model: ISubGVQA, optimizer: optax.GradientTransformation,
                       sample_batch: GraphBatch, cfg: Config) -> TrainState:
    import jax.numpy as jnp

    aimle_states = make_aimle_states(cfg)
    params, batch_stats = init_model(model, sample_batch, seed=cfg.seed,
                                     aimle_states=aimle_states)
    if cfg.clip_weights:
        # pretrained CLIP text-embedding init for fresh training — the
        # reference deep-copies CLIPModel's text tables at construction
        # (isubgvqa.py:119-121); same loader as the full converter
        from ..convert import load_clip_text_tables
        from ..models.build import apply_clip_text_tables

        params = apply_clip_text_tables(
            params, load_clip_text_tables(cfg.clip_weights))
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        batch_stats=batch_stats,
        aimle_states=aimle_states,
    )
