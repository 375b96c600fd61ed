"""Flat (segment) <-> dense per-graph view conversions.

The reference relies on ``torch_geometric.utils.to_dense_batch``
(``masking.py:145,162``) to hand ragged node scores to the samplers as
``[B, N_max]`` tensors.  Here the batcher precomputes, on the host, each
node's position inside its own graph (``pos``), so the conversion is a
single fixed-shape scatter/gather that jits.

Conventions:
* Padding nodes carry ``segment_ids == num_segments`` (one past the
  last real graph) and arbitrary ``pos``; scatters allocate one extra
  dummy row and slice it off, so padding never aliases real data.
* ``to_dense_batch`` fills unused dense slots with ``fill`` —
  default 0.0 to match ``to_dense_batch``'s ``fill_value=0`` in the
  reference, whose samplers deliberately see those zeros
  (``masking.py:162-176``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def to_dense_batch(
    flat: Array,
    segment_ids: Array,
    pos: Array,
    num_segments: int,
    max_per_segment: int,
    fill: float = 0.0,
) -> tuple[Array, Array]:
    """Scatter flat per-node values into a dense ``[B, N_max, ...]`` view.

    Returns ``(dense, valid)`` where ``valid[b, n]`` marks real slots —
    the equivalent of ``to_dense_batch``'s ``(out, mask)`` pair.
    """
    trailing = flat.shape[1:]
    dense = jnp.full((num_segments + 1, max_per_segment) + trailing, fill, flat.dtype)
    seg = jnp.minimum(segment_ids, num_segments)
    p = jnp.clip(pos, 0, max_per_segment - 1)
    dense = dense.at[seg, p].set(flat, mode="drop")
    valid = jnp.zeros((num_segments + 1, max_per_segment), dtype=bool)
    valid = valid.at[seg, p].set(segment_ids < num_segments, mode="drop")
    return dense[:num_segments], valid[:num_segments]


def from_dense_batch(
    dense: Array,
    segment_ids: Array,
    pos: Array,
    valid_mask: Optional[Array] = None,
) -> Array:
    """Gather dense ``[B, N_max, ...]`` values back to the flat layout.

    Padding rows (``segment_ids >= B``) gather from clamped indices and
    are zeroed when ``valid_mask`` (flat boolean) is given.
    """
    num_segments = dense.shape[0]
    seg = jnp.clip(segment_ids, 0, num_segments - 1)
    p = jnp.clip(pos, 0, dense.shape[1] - 1)
    out = dense[seg, p]
    if valid_mask is not None:
        shape = valid_mask.shape + (1,) * (out.ndim - valid_mask.ndim)
        out = jnp.where(valid_mask.reshape(shape), out, 0.0)
    return out


def dense_topk_mask(scores: Array, k: int) -> Array:
    """Hard 0/1 mask of the top-``k`` entries per row.

    Threshold semantics match the reference's deterministic MAP solver
    ``select_from_edge_candidates`` (``deterministic_scheme.py:36-43``):
    every entry ``>=`` the k-th largest value is selected (ties can
    yield more than k ones), and ``k >= N`` selects everything.
    """
    n = scores.shape[-1]
    if k >= n:
        return jnp.ones_like(scores)
    thresh = jax.lax.top_k(scores, k)[0][..., -1:]
    return (scores >= thresh).astype(scores.dtype)
