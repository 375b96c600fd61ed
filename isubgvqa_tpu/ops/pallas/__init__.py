"""Pallas TPU kernels for the hot fused paths."""

from .gat_kernel import fused_gat_layer, gat_layer_reference
from .gat_train import fused_gat_layer_train, fused_gatconv
from .metalayer_kernel import fused_metalayer, metalayer_reference
from .text_train import (fused_decoder_layer_train,
                         fused_encoder_layer_train)

__all__ = [
    "fused_gat_layer",
    "fused_gat_layer_train",
    "fused_gatconv",
    "gat_layer_reference",
    "fused_metalayer",
    "metalayer_reference",
    "fused_encoder_layer_train",
    "fused_decoder_layer_train",
]
