"""Segment-operation kernel library — the torch_scatter / PyG replacement.

Every graph operation in this framework is expressed as gather +
segment-reduce over fixed-shape padded arrays, so the whole model jits
and tiles onto the TPU MXU/VPU.
"""

from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    segment_normalize,
)
from .dense import to_dense_batch, from_dense_batch, dense_topk_mask

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_normalize",
    "to_dense_batch",
    "from_dense_batch",
    "dense_topk_mask",
]
