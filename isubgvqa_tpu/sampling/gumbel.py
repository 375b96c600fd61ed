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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.platform import on_tpu_backend as _on_tpu
from .topk import topk_mask

EPSILON = float(jnp.finfo(jnp.float32).tiny)
# Saturation pathology of the relaxed top-k (observed round 5: the
# on-TPU gumbel convergence run froze with NaN grads from epoch ~3).
# At tau=0.1 a round's softmax rounds to EXACTLY 1.0 once the score
# gap exceeds ~1.7, so ``1 - onehot`` underflows to 0, ``maximum``
# clamps it to EPSILON (= the smallest NORMAL f32, 2^-126), and the
# ``log`` backward contributes ``1/EPSILON = 8.5e37`` per saturated
# round — the k compounded factors plus the layer backward overflow
# f32 into inf→nan.  The reference survives on CUDA only because its
# GradScaler silently SKIPS inf/nan steps (train_epoch.py:111-126) —
# but once the gate head sharpens, every step saturates and training
# freezes permanently.
#
# TPU-native remedy (active only on TPU; CPU keeps the reference's
# exact gradients so the golden/trajectory tests pin reference
# behavior): the log-mask keeps its exact forward value EVERYWHERE
# (same EPSILON, so forwards are bit-identical across platforms), but
# its backward is cut off where the mask has saturated below
# _BWD_FLOOR — exactly the regime where the reference's own gradient
# is ~1e38-or-inf garbage that its scaler throws away.  Benign regimes
# (1-o >= 1e-3) keep bit-identical gradients.
_BWD_FLOOR = 1e-3


def _bounded_log(m: jax.Array, floor: float) -> jax.Array:
    """``log(m)`` with the backward cut off below ``floor``: the
    forward value is exactly ``log(m)``; the gradient is ``1/m`` where
    ``m > floor`` and 0 in the saturated region (where the reference's
    is inf or ~1e38 garbage)."""
    safe = jnp.maximum(m, floor)
    return jnp.log(safe) + jax.lax.stop_gradient(jnp.log(m) - jnp.log(safe))


@dataclasses.dataclass(frozen=True)
class GumbelSamplerConfig:
    k: int
    tau: float = 0.1          # reference gumbel_scheme.py:15
    hard: bool = True
    train_ensemble: int = 1   # reference masking.py:122
    val_ensemble: int = 1


def _relaxed_topk_rounds(scores: jax.Array, k: int, tau: float,
                         on_tpu: bool) -> jax.Array:
    """k rounds of masked softmax (gumbel_scheme.py:72-81)."""
    khot = jnp.zeros_like(scores)
    onehot_approx = jnp.zeros_like(scores)
    for _ in range(k):
        khot_mask = jnp.maximum(1.0 - onehot_approx, EPSILON)
        if on_tpu:
            scores = scores + _bounded_log(khot_mask, _BWD_FLOOR)
        else:
            scores = scores + jnp.log(khot_mask)
        onehot_approx = jax.nn.softmax(scores / tau, axis=-1)
        khot = khot + onehot_approx
    return khot


# Even with the per-round floor, the k rounds' ``(1/m)·(softmax/tau)``
# Jacobian factors COMPOUND: worst case ~(1e3·10)^k ≈ 1e12 at k=3,
# which downstream layer Jacobians then amplify toward f32 overflow —
# the residual NaN source after the _bounded_log fix (observed epoch
# ~10 of the round-5 gumbel run).  On TPU the whole relaxation's VJP
# output is therefore clamped elementwise: benign-regime score
# gradients are O(1-25) and pass through untouched; saturated-regime
# garbage (the reference's inf/1e38 that its GradScaler discards) is
# capped at ±_GRAD_LIMIT so the step stays finite and trainable.
_GRAD_LIMIT = 100.0


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _clamped_relaxed_topk(scores: jax.Array, k: int, tau: float) -> jax.Array:
    return _relaxed_topk_rounds(scores, k, tau, True)


def _crt_fwd(scores, k, tau):
    out, vjp_fn = jax.vjp(
        lambda s: _relaxed_topk_rounds(s, k, tau, True), scores)
    return out, vjp_fn


def _crt_bwd(k, tau, vjp_fn, dy):
    (g,) = vjp_fn(dy)
    return (jnp.clip(g, -_GRAD_LIMIT, _GRAD_LIMIT),)


_clamped_relaxed_topk.defvjp(_crt_fwd, _crt_bwd)


def _relaxed_topk(scores: jax.Array, k: int, tau: float) -> jax.Array:
    if _on_tpu():
        return _clamped_relaxed_topk(scores, k, tau)
    return _relaxed_topk_rounds(scores, k, tau, False)


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
