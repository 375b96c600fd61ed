"""Pallas TPU kernels for the hot fused paths."""

from .gat_kernel import fused_gat_layer, gat_layer_reference
from .metalayer_kernel import fused_metalayer, metalayer_reference

__all__ = [
    "fused_gat_layer",
    "gat_layer_reference",
    "fused_metalayer",
    "metalayer_reference",
]
