"""Segment reductions over padded graph arrays.

These are the TPU-native equivalents of the CUDA ``torch_scatter``
kernels the reference depends on (scatter_mean at
``scene_graph_encoder.py:141``, scatter_add at ``att_pooling.py:73``,
scatter_softmax at ``scatter_scaled_dot_product.py:7``, and the
per-destination-segment softmax in ``mgat_v2_conv.py:272``).

All functions take a static ``num_segments`` so the output shape is
fixed and the op compiles once under ``jax.jit``.  Padding entries are
handled by an optional boolean ``mask``: masked-out elements contribute
exactly zero to sums/means and zero probability to softmaxes, so dead
(padding) edges/nodes may carry arbitrary in-range segment ids.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1.0e30


def _apply_mask(data: Array, mask: Optional[Array], fill: float = 0.0) -> Array:
    if mask is None:
        return data
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    return jnp.where(mask.reshape(shape), data, jnp.asarray(fill, data.dtype))


def segment_sum(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
) -> Array:
    """Sum ``data`` rows into ``num_segments`` buckets (scatter_add)."""
    data = _apply_mask(data, mask)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    dtype=jnp.float32,
) -> Array:
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
) -> Array:
    """Mean of ``data`` per segment; empty segments yield zeros.

    Equivalent of ``torch_scatter.scatter_mean``
    (reference ``scene_graph_encoder.py:141``).
    """
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask, dtype=total.dtype)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, 1.0)


def segment_max(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    initial: float = _NEG_INF,
) -> Array:
    """Max of ``data`` per segment; empty segments yield ``initial``."""
    data = _apply_mask(data, mask, fill=initial)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # jax.ops.segment_max fills empty segments with the dtype min; clamp
    # to our sentinel so downstream arithmetic stays finite.
    return jnp.maximum(out, jnp.asarray(initial, data.dtype))


def segment_min(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    initial: float = -_NEG_INF,
) -> Array:
    data = _apply_mask(data, mask, fill=initial)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.minimum(out, jnp.asarray(initial, data.dtype))


def segment_softmax(
    logits: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
) -> Array:
    """Numerically-stable softmax within each segment.

    Equivalent of ``torch_geometric.utils.softmax`` over a batch/index
    vector (reference ``mgat_v2_conv.py:272``, ``att_pooling.py:71``)
    and of ``torch_scatter.scatter_softmax``
    (``scatter_scaled_dot_product.py:7``).

    Masked-out entries get probability 0; fully-masked segments produce
    all-zero probabilities (not NaN).
    """
    logits = _apply_mask(logits, mask, fill=_NEG_INF)
    seg_max = segment_max(logits, segment_ids, num_segments)
    shifted = logits - seg_max[segment_ids]
    # exp(-inf - (-inf)) would be NaN; force masked entries to exp(-inf)=0.
    if mask is not None:
        shape = mask.shape + (1,) * (shifted.ndim - mask.ndim)
        shifted = jnp.where(mask.reshape(shape), shifted, _NEG_INF)
    expv = jnp.exp(shifted)
    denom = jax.ops.segment_sum(expv, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, jnp.asarray(jnp.finfo(expv.dtype).tiny, expv.dtype))
    return expv / denom[segment_ids]


def segment_normalize(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    alpha: Optional[Array] = None,
    eps: float = 1e-5,
) -> tuple[Array, Array, Array]:
    """Per-segment standardization used by GraphNorm.

    Computes ``(data - alpha * mean_seg(data)) / sqrt(var + eps)`` where
    ``var`` is the biased variance of the *shifted* values per segment —
    the exact formulation of ``torch_geometric.nn.norm.GraphNorm``
    (used at reference ``scene_graph_encoder.py:33,101`` and
    ``mgat.py:93-95,171``).

    Returns ``(normalized, mean, var)``.
    """
    mean = segment_mean(data, segment_ids, num_segments, mask)
    if alpha is None:
        shifted = data - mean[segment_ids]
    else:
        shifted = data - alpha * mean[segment_ids]
    var = segment_mean(shifted * shifted, segment_ids, num_segments, mask)
    out = shifted * jax.lax.rsqrt(var[segment_ids] + eps)
    if mask is not None:
        shape = mask.shape + (1,) * (out.ndim - mask.ndim)
        out = jnp.where(mask.reshape(shape), out, 0.0)
    return out, mean, var
