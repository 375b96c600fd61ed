"""Flax model stack: question encoder/decoder, scene-graph encoder,
masked GATv2 message passing, attention pooling, and the top ISubGVQA
model."""

from .layers import MLP, GraphNorm, MaskedBatchNorm, PositionalEncoding
from .question_encoder import TextEmbedding, QuestionEncoder
from .question_decoder import QuestionDecoder
from .scene_graph_encoder import SceneGraphEncoder
from .masking import MaskingModel
from .mgat import MGAT, MGATLayer
from .pooling import GlobalAttentionPooling
from .isubgvqa import ISubGVQA, ModelOutput
from .build import build_model

__all__ = [
    "MLP",
    "GraphNorm",
    "MaskedBatchNorm",
    "PositionalEncoding",
    "TextEmbedding",
    "QuestionEncoder",
    "QuestionDecoder",
    "SceneGraphEncoder",
    "MaskingModel",
    "MGAT",
    "MGATLayer",
    "GlobalAttentionPooling",
    "ISubGVQA",
    "ModelOutput",
    "build_model",
]
