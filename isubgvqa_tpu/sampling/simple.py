"""SIMPLE: exactly-k subset sampling with exact marginals and a
straight-through gradient (Ahmed et al., "SIMPLE: A Gradient Estimator
for k-Subset Sampling"; PR-MPNN port in the reference).

The reference computes exact conditional marginals with a pickled
arithmetic circuit evaluated level-by-level under ``torch.compile``
(``sampling/methods/simple.py:113-244``) and samples via Gumbel-top-k
(``simple.py:91-110,246-252``); the straight-through estimator and
padding-to-power-of-two live in ``simple_scheme.py:87-131``.

TPU-native design: the circuit is replaced by an O(N·k)
forward/backward **elementary-symmetric-polynomial DP** over the
(position, count) lattice in log space — two ``lax.scan``s with fixed
trip counts.  It computes the *same* exactly-k marginals (the circuit
is one particular factorization of this DP) and is jit/grad-safe with
static shapes; JAX autodiff through the DP yields the exact marginal
gradients the circuit backward pass produces.

Literal weights match ``simple.py:214-217``: the "selected" weight is
``exp(θ)`` (gradient flows), the "unselected" weight is
``1 − exp(−|θ|)`` with gradient detached.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .topk import topk_mask

LARGE_NUMBER = 1.0e10   # simple_scheme.py:16
_NEG = -1.0e30


@dataclasses.dataclass(frozen=True)
class SimpleConfig:
    k: int
    train_ensemble: int = 1
    val_ensemble: int = 1
    logits_activation: Optional[str] = None


def log1mexp(x: jax.Array) -> jax.Array:
    """log(1 − exp(−|x|)), numerically stable (simple.py:44-56)."""
    x = -jnp.abs(x)
    # avoid NaN gradients from the untaken branch
    safe_hi = jnp.minimum(x, -1e-10)
    safe_lo = jnp.maximum(x, -50.0)
    return jnp.where(
        x > -0.6931471805599453,
        jnp.log(-jnp.expm1(safe_hi)),
        jnp.log1p(-jnp.exp(safe_lo)),
    )


def _esp_scan(lw0: jax.Array, lw1: jax.Array, k: int):
    """Prefix log-elementary-symmetric-polynomials.

    ``lw0, lw1``: [B, N] log-weights for item off/on.
    Returns ``(prefix, total)`` where ``prefix[i] [B, k+1]`` is the
    log-ESP over items ``< i`` and ``total [B, k+1]`` over all items.
    """
    b, n = lw0.shape
    init = jnp.full((b, k + 1), _NEG).at[:, 0].set(0.0)

    def step(carry, lw):
        w0, w1 = lw                                   # [B] each
        keep = carry + w0[:, None]
        take = carry[:, :-1] + w1[:, None]
        new = keep.at[:, 1:].set(jnp.logaddexp(keep[:, 1:], take))
        return new, carry

    total, prefix = jax.lax.scan(
        step, init, (jnp.swapaxes(lw0, 0, 1), jnp.swapaxes(lw1, 0, 1))
    )
    return jnp.swapaxes(prefix, 0, 1), total          # [B, N, k+1], [B, k+1]


def exact_k_marginals(scores: jax.Array, k: int) -> jax.Array:
    """Exact marginals ``p(i ∈ S | |S| = k)`` for ``scores [B, N]``.

    Weighted-model-counting semantics identical to the reference
    circuit (``simple.py:214-231``): weight(x_i=1) = exp(θ_i),
    weight(x_i=0) = 1 − exp(−|θ_i|) (detached).
    """
    if k <= 0:
        return jnp.zeros_like(scores)
    n = scores.shape[-1]
    k = min(k, n)
    lw1 = scores
    lw0 = log1mexp(-jax.lax.stop_gradient(scores))    # simple.py:215-216 detach
    lw0 = jnp.maximum(lw0, _NEG)

    prefix, total = _esp_scan(lw0, lw1, k)            # over items < i
    # suffix ESP over items > i: scan the reversed sequence
    prefix_r, _ = _esp_scan(lw0[:, ::-1], lw1[:, ::-1], k)
    suffix = prefix_r[:, ::-1]                        # suffix[i] = ESP items > i

    log_z = total[:, k]                               # [B]
    # log p_i = lw1_i + logsumexp_j(prefix[i][j] + suffix[i][k-1-j]) − logZ
    j = jnp.arange(k)
    combo = prefix[:, :, j] + suffix[:, :, (k - 1) - j]   # [B, N, k]
    log_num = lw1 + jax.scipy.special.logsumexp(combo, axis=-1)
    log_p = log_num - log_z[:, None]
    return jnp.exp(jnp.minimum(log_p, 0.0))


def gumbel_topk_hard(scores: jax.Array, key: jax.Array, k: int,
                     times_sampled: int) -> jax.Array:
    """Hard one-hot Gumbel-top-k samples ``[S, B, N]``
    (simple.py:91-110,246-252)."""
    g = jax.random.gumbel(key, (times_sampled,) + scores.shape, scores.dtype)
    perturbed = scores[None] + g
    return topk_mask(jax.lax.stop_gradient(perturbed), k)


def simple_sample(
    scores: jax.Array,
    key: Optional[jax.Array],
    cfg: SimpleConfig,
    train: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """EdgeSIMPLEBatched.forward for the ``edge_candid`` policy
    (simple_scheme.py:79-162): returns ``(masks [S, B, N],
    marginals [B, N])`` where masks carry the straight-through
    gradient ``(sample − marginal).detach() + marginal``.
    """
    b, n = scores.shape
    local_k = min(cfg.k, n)
    times_sampled = cfg.train_ensemble if train else cfg.val_ensemble

    marginals = exact_k_marginals(scores, local_k)
    samples = gumbel_topk_hard(scores, key, local_k, times_sampled)
    ste = (jax.lax.stop_gradient(samples - marginals[None])
           + marginals[None])
    return ste, marginals


def simple_validation(scores: jax.Array, key: Optional[jax.Array],
                      cfg: SimpleConfig) -> tuple[jax.Array, jax.Array]:
    """Deterministic eval path (simple_scheme.py:164-191): marginals +
    hard top-k mask when val_ensemble == 1."""
    if cfg.val_ensemble == 1:
        _, marginals = simple_sample(scores, key, cfg, train=False)
        mask = topk_mask(jax.lax.stop_gradient(scores), min(cfg.k, scores.shape[-1]))
        return mask[None], marginals
    return simple_sample(scores, key, cfg, train=False)
