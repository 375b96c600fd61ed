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


def batched_edge_index_to_batched_adj(
    src: jax.Array,                 # [B, E] within-graph positions
    dst: jax.Array,                 # [B, E]
    edge_mask: jax.Array,           # [B, E] validity
    node_mask: jax.Array,           # [B, N] validity
):
    """Dense-layout ``batched_edge_index_to_batched_adj``
    (``tensor_utils.py:8-47``): returns ``(original_adj, rewire_adj)``
    as boolean ``[B, N, N]`` adjacencies.

    ``original_adj`` marks every existing edge; ``rewire_adj`` is the
    "don't sample here" mask for the global rewiring policies —
    existing *non-loop* edges plus the full diagonal of valid nodes
    (the reference strips existing self-loops then re-adds one per
    node, ``tensor_utils.py:27-39``).  The reference's sparse index
    triples become dense masks because :func:`rewire_global_directed`
    consumes dense ``[B, N, N]`` here (scatter-free TPU layout).
    """
    n = node_mask.shape[1]
    oh_src = jax.nn.one_hot(src, n, dtype=jnp.float32)
    oh_dst = jax.nn.one_hot(dst, n, dtype=jnp.float32)
    ev = edge_mask.astype(jnp.float32)[..., None]
    original = jnp.einsum("ben,bem->bnm", oh_src * ev, oh_dst) > 0
    eye = jnp.eye(n, dtype=bool)[None]
    non_loop = original & ~eye
    diag = eye & node_mask[:, :, None] & node_mask[:, None, :]
    return original, non_loop | diag


def non_merge_coalesce(src: jax.Array, dst: jax.Array,
                       edge_attr: jax.Array | None,
                       edge_weight: jax.Array | None,
                       num_nodes: int,
                       edge_mask: jax.Array | None = None,
                       sort_by_row: bool = True):
    """``tensor_utils.py:91-114``: sort edges lexicographically by
    (row, col) — or (col, row) — carrying attrs/weights along,
    WITHOUT merging duplicates.  Jit-safe: a stable argsort on the
    fused ``major * num_nodes + minor`` key; invalid (padded) edges
    sort to the end.  Works on ``[E]`` or batched ``[B, E]`` indices.
    """
    major, minor = (src, dst) if sort_by_row else (dst, src)
    key = major.astype(jnp.int32) * num_nodes + minor.astype(jnp.int32)
    if edge_mask is not None:
        key = jnp.where(edge_mask, key, jnp.iinfo(jnp.int32).max)
    perm = jnp.argsort(key, axis=-1, stable=True)

    def take(x):
        return jnp.take_along_axis(x, perm, axis=-1) if x.ndim == perm.ndim \
            else jnp.take_along_axis(
                x, perm.reshape(perm.shape + (1,) * (x.ndim - perm.ndim)),
                axis=perm.ndim - 1)

    out = (take(src), take(dst),
           take(edge_attr) if edge_attr is not None else None,
           take(edge_weight) if edge_weight is not None else None)
    if edge_mask is not None:
        out = out + (take(edge_mask),)
    return out


def batch_repeat_edge_index(edge_index: jax.Array, num_nodes: int,
                            repeats: int) -> jax.Array:
    """``tensor_utils.py:117-124``: tile a flat ``[2, E]`` edge index
    ``repeats`` times, offsetting each copy by ``num_nodes`` (ensemble
    batching for the rewiring samplers)."""
    if repeats == 1:
        return edge_index
    e = edge_index.shape[1]
    offsets = (jnp.arange(repeats, dtype=edge_index.dtype)
               * num_nodes).repeat(e)
    return jnp.tile(edge_index, (1, repeats)) + offsets[None, :]
