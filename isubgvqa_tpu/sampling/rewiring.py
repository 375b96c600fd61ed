"""Global edge-rewiring sampler policies and support utilities.

Jit-safe equivalents of the reference's PR-MPNN support code that the
VQA path does not exercise but the sampler library exposes:

* :func:`rewire_global_directed` / :func:`rewire_global_undirected` —
  dense-adjacency top-k edge rewiring MAP solvers
  (``sampling/methods/deterministic_scheme.py:6-33``), used by the
  ``global_directed`` / ``global_undirected`` policies of
  IMLE/SIMPLE/Gumbel (``imle_scheme.py:20-23``,
  ``simple_scheme.py:47-78``, ``gumbel_scheme.py:28-54``);
* :func:`masked_softmax`, :func:`weighted_cross_entropy` — tensor
  utilities (``sampling/methods/tensor_utils.py:50-88``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LARGE_NUMBER = 1.0e10


def _existing_penalty(scores: jax.Array, adj: jax.Array | None) -> jax.Array:
    """Subtract LARGE_NUMBER at existing-edge positions so they are
    never re-selected (``deterministic_scheme.py:10,24``).  ``adj`` is
    a dense boolean [B, N, N] (the reference uses index tuples)."""
    if adj is None:
        return scores
    return scores - adj[..., None].astype(scores.dtype) * LARGE_NUMBER


def rewire_global_directed(scores: jax.Array, k: int,
                           adj: jax.Array | None = None) -> jax.Array:
    """Top-k over all N² directed pairs per graph
    (``deterministic_scheme.py:6-16``).

    ``scores [B, N, N, E]`` -> 0/1 mask of the k best new edges.
    """
    b, n, _, e = scores.shape
    scores = _existing_penalty(scores, adj)
    flat = scores.reshape(b, n * n, e)
    kk = min(k, n * n)
    thresh = jax.lax.top_k(flat.swapaxes(1, 2), kk)[0][..., -1]  # [B, E]
    mask = (flat >= thresh[:, None, :]).astype(scores.dtype)
    return mask.reshape(b, n, n, e)


def rewire_global_undirected(scores: jax.Array, k: int,
                             adj: jax.Array | None = None) -> jax.Array:
    """Top-k over the strict upper triangle, symmetrized
    (``deterministic_scheme.py:19-33``)."""
    b, n, _, e = scores.shape
    scores = _existing_penalty(scores, adj)
    scores = scores + scores.swapaxes(1, 2)
    iu, ju = jnp.triu_indices(n, k=1)
    flat = scores[:, iu, ju, :]                      # [B, T, E]
    kk = min(k, flat.shape[1])
    thresh = jax.lax.top_k(flat.swapaxes(1, 2), kk)[0][..., -1]
    tri_mask = (flat >= thresh[:, None, :]).astype(scores.dtype)
    out = jnp.zeros_like(scores)
    out = out.at[:, iu, ju, :].set(tri_mask)
    return out + out.swapaxes(1, 2)


def masked_softmax(logits: jax.Array, mask: jax.Array,
                   axis: int = -1) -> jax.Array:
    """Softmax restricted to masked-in entries
    (``tensor_utils.py:50-65``)."""
    neg = jnp.asarray(-1.0e30, logits.dtype)
    masked = jnp.where(mask > 0, logits, neg)
    out = jax.nn.softmax(masked, axis=axis)
    return jnp.where(mask > 0, out, 0.0)


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """Per-sample weighted CE (``tensor_utils.py:68-88``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)
