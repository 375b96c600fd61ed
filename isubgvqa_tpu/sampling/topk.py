"""Deterministic MAP solver: per-row top-k 0/1 mask.

Equivalent of the reference's ``select_from_edge_candidates``
(``sampling/methods/deterministic_scheme.py:36-43``) which backs the
``edge_candid`` policy used everywhere in the VQA path
(``imle_scheme.py:24-25``, ``simple_scheme.py:186``,
``gumbel_scheme.py:117``).
"""

from __future__ import annotations

import jax

from ..ops.dense import dense_topk_mask


def topk_mask(scores: jax.Array, k: int) -> jax.Array:
    """Hard top-k mask along the last axis; ``k >= N`` selects all.

    Threshold semantics (``>=`` k-th value, ties select extra entries)
    match ``deterministic_scheme.py:41-43``.
    """
    return dense_topk_mask(scores, k)


def topk_mask_stopgrad(scores: jax.Array, k: int) -> jax.Array:
    """topk_mask with gradients severed (the reference solver runs
    under ``@torch.no_grad()``, ``imle_scheme.py:16``)."""
    return topk_mask(jax.lax.stop_gradient(scores), k)
