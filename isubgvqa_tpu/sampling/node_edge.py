"""Node mask → edge mask with the reference's custom backward.

Equivalent of ``NodeMaskToEdgeMask``
(``sampling/node_edge_masks.py:5-19``): forward is
``edge_mask[e] = mask[src[e]] * mask[dst[e]]``; the backward
deliberately scatter-sums the incoming gradient to **destination nodes
only** (``node_edge_masks.py:13-19``) rather than applying the product
rule — reproduced here with a ``jax.custom_vjp``.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def node_mask_to_edge_mask(mask: jax.Array, src: jax.Array, dst: jax.Array,
                           num_nodes: int) -> jax.Array:
    """``mask [N, 1]`` (or ``[N]``), ``src/dst [E]`` → edge mask
    ``[E, 1]`` (or ``[E]``)."""
    return mask[src] * mask[dst]


def _fwd(mask, src, dst, num_nodes):
    return mask[src] * mask[dst], (mask, src, dst)


def _bwd(num_nodes, residuals, g):
    mask, src, dst = residuals
    grad_mask = jax.ops.segment_sum(g, dst, num_segments=num_nodes)
    grad_mask = grad_mask.reshape(mask.shape).astype(mask.dtype)
    src_ct = np.zeros(src.shape, dtype=jax.dtypes.float0)
    dst_ct = np.zeros(dst.shape, dtype=jax.dtypes.float0)
    return grad_mask, src_ct, dst_ct


node_mask_to_edge_mask.defvjp(_fwd, _bwd)
