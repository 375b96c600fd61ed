"""Host-side data layer: GQA questions, scene graphs, vocabularies,
tokenization, and padded fixed-shape batching for the TPU."""

from .vocab import SceneGraphVocab
from .tokenizer import build_tokenizer, HashWordTokenizer
from .scene_graph import SceneGraphStore, GraphArrays, convert_scene_graph
from .gqa import GQADataset, AnswerMap
from .batching import GraphBatch, Collator, BucketSpec
from .synthetic import SyntheticGQA

__all__ = [
    "SceneGraphVocab",
    "build_tokenizer",
    "HashWordTokenizer",
    "SceneGraphStore",
    "GraphArrays",
    "convert_scene_graph",
    "GQADataset",
    "AnswerMap",
    "GraphBatch",
    "Collator",
    "BucketSpec",
    "SyntheticGQA",
]
