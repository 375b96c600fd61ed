"""Padded, fixed-shape graph mini-batches — the PyG ``Batch.from_data_list``
replacement (reference ``datasets/gqa.py:237-272``), designed TPU-first.

A batch concatenates all graphs' nodes/edges into flat *segment arrays*
padded to static sizes (``N_pad = B * nodes_per_graph_budget``,
``E_pad = B * edges_per_graph_budget``), so every training/eval step
compiles exactly once.  Padding rows carry ``graph_id == num_graphs``
and a zero validity mask; all downstream segment ops mask them to exact
zeros (see :mod:`isubgvqa_tpu.ops.segment`).

``node_pos`` (each node's index inside its own graph) is precomputed on
the host so the samplers' dense ``[B, N_max]`` view
(``to_dense_batch``, reference ``masking.py:145,162``) is a single
fixed-shape scatter.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, List, Optional, Sequence

import jax
import numpy as np
from flax import struct

from .scene_graph import GraphArrays, convert_scene_graph, EMPTY_SG_2

logger = logging.getLogger(__name__)


class GraphBatch(struct.PyTreeNode):
    """One device-ready mini-batch (a JAX pytree; all shapes static)."""

    # nodes (flat, padded to N_pad)
    node_tokens: jax.Array    # int32 [N_pad, 4]
    node_bbox: jax.Array      # float32 [N_pad, 4]
    node_graph: jax.Array     # int32 [N_pad]; padding rows == num_graphs
    node_pos: jax.Array       # int32 [N_pad]; index within own graph
    node_mask: jax.Array      # bool  [N_pad]

    # edges (flat, padded to E_pad)
    edge_src: jax.Array       # int32 [E_pad]
    edge_dst: jax.Array       # int32 [E_pad]
    edge_token: jax.Array     # int32 [E_pad]
    edge_graph: jax.Array     # int32 [E_pad]
    edge_sign: jax.Array      # float32 [E_pad]; -1 on added symmetric edges
    edge_mask: jax.Array      # bool  [E_pad]

    # questions / labels
    qst_tokens: jax.Array     # int32 [B, L]
    qst_mask: jax.Array       # int32 [B, L]
    labels: jax.Array         # int32 [B]
    sample_mask: jax.Array    # float32 [B]; 0 on padding samples

    # static metadata
    num_graphs: int = struct.field(pytree_node=False)
    max_nodes_per_graph: int = struct.field(pytree_node=False)

    @property
    def num_nodes_padded(self) -> int:
        return self.node_tokens.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.edge_src.shape[0]

    @property
    def node_graph_clamped(self) -> jax.Array:
        """graph ids safe for gathering from per-graph [B, ...] arrays."""
        import jax.numpy as jnp

        return jnp.minimum(self.node_graph, self.num_graphs - 1)


@dataclasses.dataclass
class BatchMeta:
    """Host-side companion of a GraphBatch (ids, raw text, types)."""

    question_ids: List[str]
    image_ids: List[str]
    questions: List[str]
    qst_types: List[dict]
    num_real: int
    graphs: List[GraphArrays]


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static shape bucket for a batch size."""

    batch_size: int
    nodes_per_graph_budget: int = 40
    edges_per_graph_budget: int = 130
    max_nodes_per_graph: int = 128
    question_len: int = 32

    @property
    def n_pad(self) -> int:
        return self.batch_size * self.nodes_per_graph_budget

    @property
    def e_pad(self) -> int:
        return self.batch_size * self.edges_per_graph_budget


class Collator:
    """Samples -> GraphBatch with static shapes.

    A graph that would overflow the batch's node/edge budget is
    replaced by the 2-node dummy graph (and counted) instead of
    breaking the static shape — at the reference's defaults the
    budgets exceed GQA's per-batch totals with overwhelming margin.
    """

    def __init__(self, tokenizer, spec: BucketSpec, vocab=None):
        self.tokenizer = tokenizer
        self.spec = spec
        self._dummy: Optional[GraphArrays] = None
        self._vocab = vocab
        self.dropped_graphs = 0

    def _dummy_graph(self) -> GraphArrays:
        if self._dummy is None:
            assert self._vocab is not None, "Collator needs vocab for overflow dummies"
            self._dummy = convert_scene_graph(EMPTY_SG_2, self._vocab)
        return self._dummy

    def collate(self, samples: Sequence) -> tuple[GraphBatch, BatchMeta]:
        spec = self.spec
        b = spec.batch_size
        num_real = len(samples)
        assert num_real <= b

        node_tokens = np.ones((spec.n_pad, 4), np.int32)   # <pad> token id 1
        node_bbox = np.zeros((spec.n_pad, 4), np.float32)
        node_graph = np.full((spec.n_pad,), b, np.int32)
        node_pos = np.zeros((spec.n_pad,), np.int32)
        node_mask = np.zeros((spec.n_pad,), bool)
        edge_src = np.zeros((spec.e_pad,), np.int32)
        edge_dst = np.zeros((spec.e_pad,), np.int32)
        edge_token = np.ones((spec.e_pad,), np.int32)
        edge_graph = np.full((spec.e_pad,), b, np.int32)
        edge_sign = np.ones((spec.e_pad,), np.float32)
        edge_mask = np.zeros((spec.e_pad,), bool)
        labels = np.zeros((b,), np.int32)
        sample_mask = np.zeros((b,), np.float32)

        graphs: List[GraphArrays] = []
        n_off = e_off = 0
        for gi in range(num_real):
            g: GraphArrays = samples[gi].graph
            if g.num_nodes > spec.max_nodes_per_graph:
                g = _truncate(g, spec.max_nodes_per_graph)
            if (n_off + g.num_nodes > spec.n_pad
                    or e_off + g.num_edges > spec.e_pad):
                self.dropped_graphs += 1
                logger.warning("graph overflowed batch budget; using dummy")
                g = self._dummy_graph()
            graphs.append(g)
            n, e = g.num_nodes, g.num_edges
            node_tokens[n_off:n_off + n] = g.node_tokens
            node_bbox[n_off:n_off + n] = g.node_bbox
            node_graph[n_off:n_off + n] = gi
            node_pos[n_off:n_off + n] = np.arange(n)
            node_mask[n_off:n_off + n] = True
            edge_src[e_off:e_off + e] = g.edge_src + n_off
            edge_dst[e_off:e_off + e] = g.edge_dst + n_off
            edge_token[e_off:e_off + e] = g.edge_token
            edge_graph[e_off:e_off + e] = gi
            edge_sign[e_off:e_off + e] = g.edge_sign
            edge_mask[e_off:e_off + e] = True
            labels[gi] = samples[gi].label
            sample_mask[gi] = 1.0
            n_off += n
            e_off += e

        qst_tokens, qst_mask = self.tokenizer(
            [s.question for s in samples], max_len=spec.question_len
        )
        q_ids = np.full((b, spec.question_len), self.tokenizer.pad_id, np.int32)
        q_mask = np.zeros((b, spec.question_len), np.int32)
        q_ids[:num_real] = qst_tokens
        q_mask[:num_real] = qst_mask

        batch = GraphBatch(
            node_tokens=node_tokens, node_bbox=node_bbox,
            node_graph=node_graph, node_pos=node_pos, node_mask=node_mask,
            edge_src=edge_src, edge_dst=edge_dst, edge_token=edge_token,
            edge_graph=edge_graph, edge_sign=edge_sign, edge_mask=edge_mask,
            qst_tokens=q_ids, qst_mask=q_mask, labels=labels,
            sample_mask=sample_mask,
            num_graphs=b, max_nodes_per_graph=spec.max_nodes_per_graph,
        )
        meta = BatchMeta(
            question_ids=[s.question_id for s in samples],
            image_ids=[s.image_id for s in samples],
            questions=[s.question for s in samples],
            qst_types=[s.qst_type for s in samples],
            num_real=num_real,
            graphs=graphs,
        )
        return batch, meta


def _truncate(g: GraphArrays, max_nodes: int) -> GraphArrays:
    keep = (g.edge_src < max_nodes) & (g.edge_dst < max_nodes)
    return GraphArrays(
        node_tokens=g.node_tokens[:max_nodes],
        node_bbox=g.node_bbox[:max_nodes],
        edge_src=g.edge_src[keep],
        edge_dst=g.edge_dst[keep],
        edge_token=g.edge_token[keep],
        edge_sign=g.edge_sign[keep],
    )


def iterate_batches(
    dataset,
    collator: Collator,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[tuple[GraphBatch, BatchMeta]]:
    """Fixed-shape batch iterator with DistributedSampler-like sharding
    (reference ``datasets/build.py:44-53``): each data-parallel process
    takes a strided slice of the (optionally shuffled) index list."""
    b = collator.spec.batch_size
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    idx = idx[shard_index::num_shards]
    n_full = len(idx) // b
    for i in range(n_full):
        chunk = idx[i * b:(i + 1) * b]
        yield collator.collate([dataset[int(j)] for j in chunk])
    rem = len(idx) - n_full * b
    if rem and not drop_last:
        chunk = idx[n_full * b:]
        yield collator.collate([dataset[int(j)] for j in chunk])
