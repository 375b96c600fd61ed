"""Iterative relaxed Gumbel top-k sampler with straight-through gradient.

TPU-native equivalent of ``GumbelSampler``
(``sampling/methods/gumbel_scheme.py:13-123``, ``edge_candid`` policy):
k rounds of temperature-softmax with a log(1 - selected) mask
accumulator, then a hard top-k straight-through estimator.  The k-round
loop has a static trip count so it unrolls/fuses under ``jit``.

Eval semantics (reference parity, pinned by
``tests/test_samplers.py::test_gumbel_eval_is_noisy_forward``): the
masking head calls the sampler's *forward* with ``train=False``
(``masking.py:175``), which still adds Gumbel noise — ``train`` only
selects the ensemble size (``gumbel_scheme.py:26,63``).  The
deterministic ``validation()`` method (``gumbel_scheme.py:109-123``)
exists but is never reached from the masking path; it is provided here
as :func:`gumbel_validation` for capability parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .topk import topk_mask

EPSILON = float(jnp.finfo(jnp.float32).tiny)


@dataclasses.dataclass(frozen=True)
class GumbelSamplerConfig:
    k: int
    tau: float = 0.1          # reference gumbel_scheme.py:15
    hard: bool = True
    train_ensemble: int = 1   # reference masking.py:122
    val_ensemble: int = 1


def _relaxed_topk(scores: jax.Array, k: int, tau: float) -> jax.Array:
    """k rounds of masked softmax (gumbel_scheme.py:72-81)."""
    khot = jnp.zeros_like(scores)
    onehot_approx = jnp.zeros_like(scores)
    for _ in range(k):
        khot_mask = jnp.maximum(1.0 - onehot_approx, EPSILON)
        scores = scores + jnp.log(khot_mask)
        onehot_approx = jax.nn.softmax(scores / tau, axis=-1)
        khot = khot + onehot_approx
    return khot


def gumbel_topk_sample(
    scores: jax.Array,
    key: Optional[jax.Array],
    cfg: GumbelSamplerConfig,
    train: bool = True,
) -> jax.Array:
    """Sample an ensemble of hard top-k masks; returns ``[S, B, N]``.

    Follows ``gumbel_scheme.py:26-107`` for *both* train and eval:
    ``train`` only picks the ensemble size (``:26,63``) — Gumbel noise
    is added either way, so eval masks are stochastic exactly as the
    reference's are when the masking head calls ``sampler(gate,
    train=False)`` (``masking.py:175``).
    """
    b, n = scores.shape
    local_k = min(cfg.k, n)
    repeat = cfg.train_ensemble if train else cfg.val_ensemble
    tiled = jnp.broadcast_to(scores[None], (repeat, b, n)).reshape(repeat * b, n)
    g = jax.random.gumbel(key, tiled.shape, dtype=tiled.dtype)
    perturbed = tiled + g
    khot = _relaxed_topk(perturbed, local_k, cfg.tau)
    if cfg.hard:
        hard = topk_mask(jax.lax.stop_gradient(khot), local_k)
        res = hard - jax.lax.stop_gradient(khot) + khot
    else:
        res = khot
    return res.reshape(repeat, b, n)


def gumbel_validation(
    scores: jax.Array,
    key: Optional[jax.Array],
    cfg: GumbelSamplerConfig,
) -> jax.Array:
    """``GumbelSampler.validation`` (``gumbel_scheme.py:109-123``):
    deterministic top-k when ``val_ensemble == 1``, else the noisy
    forward.  Capability parity only — the reference's masking path
    never calls it (it always uses the forward, ``masking.py:175``).
    Returns ``[S, B, N]``."""
    if cfg.val_ensemble == 1:
        return topk_mask(jax.lax.stop_gradient(scores),
                         min(cfg.k, scores.shape[-1]))[None]
    return gumbel_topk_sample(scores, key, cfg, train=False)
