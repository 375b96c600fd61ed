"""Per-graph ratio-or-count top-k over the dense node layout.

Equivalent of ``utils/topk.py:5-46`` (used by the vestigial
``topk_sampling`` path, ``masking.py:202-211``): select, per graph,
either ``ceil(ratio * num_nodes)`` nodes (float ratio) or ``min(k,
num_nodes)`` nodes (int k), by score.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp


def topk_per_graph(scores: jax.Array, ratio_or_k: Union[float, int],
                   node_mask: jax.Array) -> jax.Array:
    """``scores [B, N]``, ``node_mask [B, N]`` -> 0/1 mask selecting
    the per-graph top-k (data-dependent k per graph, static shapes)."""
    b, n = scores.shape
    num_nodes = jnp.sum(node_mask, axis=1)                  # [B]
    if isinstance(ratio_or_k, int) or (
            isinstance(ratio_or_k, float) and ratio_or_k > 1):
        k_per_graph = jnp.minimum(int(ratio_or_k), num_nodes)
    else:
        k_per_graph = jnp.ceil(ratio_or_k * num_nodes).astype(jnp.int32)

    neg = jnp.asarray(-1.0e30, scores.dtype)
    masked = jnp.where(node_mask, scores, neg)
    order = jnp.argsort(-masked, axis=1)                    # descending
    ranks = jnp.zeros((b, n), jnp.int32)
    ranks = jax.vmap(lambda r, o: r.at[o].set(jnp.arange(n)))(ranks, order)
    keep = ranks < k_per_graph[:, None]
    return (keep & node_mask).astype(scores.dtype)
