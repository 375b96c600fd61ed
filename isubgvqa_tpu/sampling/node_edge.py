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
import jax.numpy as jnp
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


@jax.custom_vjp
def dense_node_gate_to_edge_gate(gate: jax.Array, oh_src: jax.Array,
                                 oh_dst: jax.Array) -> jax.Array:
    """Dense-layout ``NodeMaskToEdgeMask`` — the version the live GAT
    path trains through.

    ``gate [B, N, 1]``, ``oh_src/oh_dst [B, E, N]`` (one-hot incidence
    matrices with the edge-validity mask folded in) → edge gate
    ``[B, E, 1]``.  Forward is ``gate[src]·gate[dst]`` as two one-hot
    matmuls; the backward reproduces the reference's quirk
    (``sampling/node_edge_masks.py:13-19``): the incoming cotangent is
    scatter-summed to **destination nodes only** — the product rule's
    ``gate[dst]``/``gate[src]`` weightings are deliberately dropped.
    Invalid edges carry zero rows in the incidences, so they neither
    produce edge gates nor leak gradient.
    """
    gs = jnp.einsum("ben,bnk->bek", oh_src, gate)
    gd = jnp.einsum("ben,bnk->bek", oh_dst, gate)
    return gs * gd


def _dense_fwd(gate, oh_src, oh_dst):
    sentinel = jnp.zeros((0,), gate.dtype)   # carries the primal dtype
    return dense_node_gate_to_edge_gate(gate, oh_src, oh_dst), (
        sentinel, oh_src, oh_dst)


def _dense_bwd(residuals, g):
    sentinel, oh_src, oh_dst = residuals
    grad_gate = jnp.einsum("ben,bek->bnk", oh_dst, g).astype(sentinel.dtype)
    return grad_gate, jnp.zeros_like(oh_src), jnp.zeros_like(oh_dst)


dense_node_gate_to_edge_gate.defvjp(_dense_fwd, _dense_bwd)
