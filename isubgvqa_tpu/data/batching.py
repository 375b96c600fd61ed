"""Dense, fixed-shape graph mini-batches — the PyG ``Batch.from_data_list``
replacement (reference ``datasets/gqa.py:237-272``), designed TPU-first.

Layout: a batch stacks graphs into dense per-graph arrays —
``[B, N_max, ...]`` nodes and ``[B, E_max, ...]`` edges with per-edge
*within-graph* node positions — instead of PyG's dynamic COO concat.
Consequences:

* every array shape is static, so each step compiles exactly once;
* the samplers' ``[B, N_max]`` view (``to_dense_batch``,
  reference ``masking.py:145,162``) is the native layout — free;
* every edge<->node move is a batched gather or one-hot matmul
  (:mod:`isubgvqa_tpu.ops.dense_graph`) — **no scatters anywhere**,
  which measured ~1.1 ms fixed cost per call on v5e and dominated the
  flat segment formulation.

Graphs larger than the static caps are truncated (nodes) and counted;
GQA's distribution (~17 nodes, ~45 edges mean) leaves wide margins at
the defaults.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, List, Sequence

import jax
import numpy as np
from flax import struct

from .scene_graph import GraphArrays

logger = logging.getLogger(__name__)


class GraphBatch(struct.PyTreeNode):
    """One device-ready mini-batch (a JAX pytree; all shapes static)."""

    # nodes, dense per graph
    node_tokens: jax.Array    # int32 [B, N, 4]
    node_bbox: jax.Array      # float32 [B, N, 4]
    node_mask: jax.Array      # bool  [B, N]

    # edges, dense per graph; positions index within the own graph
    edge_src: jax.Array       # int32 [B, E]
    edge_dst: jax.Array       # int32 [B, E]
    edge_token: jax.Array     # int32 [B, E]
    edge_sign: jax.Array      # float32 [B, E]; -1 on added symmetric edges
    edge_mask: jax.Array      # bool  [B, E]

    # questions / labels
    qst_tokens: jax.Array     # int32 [B, L]
    qst_mask: jax.Array       # int32 [B, L]
    labels: jax.Array         # int32 [B]
    sample_mask: jax.Array    # float32 [B]; 0 on padding samples

    @property
    def num_graphs(self) -> int:
        return self.node_tokens.shape[0]

    @property
    def max_nodes_per_graph(self) -> int:
        return self.node_tokens.shape[1]

    @property
    def max_edges_per_graph(self) -> int:
        return self.edge_src.shape[1]


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
    max_nodes_per_graph: int = 128
    max_edges_per_graph: int = 384
    question_len: int = 32


class Collator:
    """Samples -> dense GraphBatch with static shapes.

    Oversized graphs are truncated to the caps (dropped nodes/edges are
    counted in ``truncated_nodes`` / ``truncated_edges``).

    When constructed with a shared
    :class:`~isubgvqa_tpu.native.PackedGraphStore` (as
    ``build_bucket_collators`` does), the per-graph fill loop runs in
    the native C++ kernel (:mod:`isubgvqa_tpu.native.collate`) — the
    Python loop below stays as the fallback and the parity oracle
    (tests/test_native_collate.py).  Both paths produce identical
    batches and truncation counts.
    """

    def __init__(self, tokenizer, spec: BucketSpec, vocab=None,
                 packed_store=None):
        self.tokenizer = tokenizer
        self.spec = spec
        self._vocab = vocab
        self.truncated_nodes = 0
        self.truncated_edges = 0
        self._packed = packed_store
        if packed_store is not None:
            from ..native.collate import load_collate_lib
            self._native_lib = load_collate_lib()
        else:
            self._native_lib = None

    def _questions_to_arrays(self, samples: Sequence):
        spec = self.spec
        num_real = len(samples)
        qst_tokens, qst_mask = self.tokenizer(
            [s.question for s in samples], max_len=spec.question_len
        )
        q_ids = np.full((spec.batch_size, spec.question_len),
                        self.tokenizer.pad_id, np.int32)
        q_mask = np.zeros((spec.batch_size, spec.question_len), np.int32)
        q_ids[:num_real] = qst_tokens
        q_mask[:num_real] = qst_mask
        return q_ids, q_mask

    def _collate_native(self, samples: Sequence) -> tuple[GraphBatch,
                                                          BatchMeta]:
        spec = self.spec
        b, n, e = (spec.batch_size, spec.max_nodes_per_graph,
                   spec.max_edges_per_graph)
        num_real = len(samples)
        assert num_real <= b
        graphs = [s.graph for s in samples]
        rows = self._packed.rows(graphs)
        labels_in = np.asarray([s.label for s in samples], np.int32)
        (node_tokens, node_bbox, node_mask, edge_src, edge_dst, edge_token,
         edge_sign, edge_mask, labels, sample_mask, tn, te) = \
            self._packed.fill_batch(self._native_lib, rows, labels_in,
                                    b, n, e)
        self.truncated_nodes += tn
        self.truncated_edges += te
        q_ids, q_mask = self._questions_to_arrays(samples)
        batch = GraphBatch(
            node_tokens=node_tokens, node_bbox=node_bbox, node_mask=node_mask,
            edge_src=edge_src, edge_dst=edge_dst, edge_token=edge_token,
            edge_sign=edge_sign, edge_mask=edge_mask,
            qst_tokens=q_ids, qst_mask=q_mask, labels=labels,
            sample_mask=sample_mask,
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

    def collate(self, samples: Sequence) -> tuple[GraphBatch, BatchMeta]:
        if self._native_lib is not None:
            return self._collate_native(samples)
        spec = self.spec
        b, n, e = spec.batch_size, spec.max_nodes_per_graph, spec.max_edges_per_graph
        num_real = len(samples)
        assert num_real <= b

        node_tokens = np.ones((b, n, 4), np.int32)   # <pad> token id 1
        node_bbox = np.zeros((b, n, 4), np.float32)
        node_mask = np.zeros((b, n), bool)
        edge_src = np.zeros((b, e), np.int32)
        edge_dst = np.zeros((b, e), np.int32)
        edge_token = np.ones((b, e), np.int32)
        edge_sign = np.ones((b, e), np.float32)
        edge_mask = np.zeros((b, e), bool)
        labels = np.zeros((b,), np.int32)
        sample_mask = np.zeros((b,), np.float32)

        graphs: List[GraphArrays] = []
        for gi in range(num_real):
            g: GraphArrays = samples[gi].graph
            gn = g.num_nodes
            if gn > n:
                self.truncated_nodes += gn - n
                gn = n
            keep = (g.edge_src < gn) & (g.edge_dst < gn)
            ge = int(keep.sum())
            if ge > e:
                self.truncated_edges += ge - e
                ge = e
            sel = np.nonzero(keep)[0][:ge]
            graphs.append(g)
            node_tokens[gi, :gn] = g.node_tokens[:gn]
            node_bbox[gi, :gn] = g.node_bbox[:gn]
            node_mask[gi, :gn] = True
            edge_src[gi, :ge] = g.edge_src[sel]
            edge_dst[gi, :ge] = g.edge_dst[sel]
            edge_token[gi, :ge] = g.edge_token[sel]
            edge_sign[gi, :ge] = g.edge_sign[sel]
            edge_mask[gi, :ge] = True
            labels[gi] = samples[gi].label
            sample_mask[gi] = 1.0

        q_ids, q_mask = self._questions_to_arrays(samples)

        batch = GraphBatch(
            node_tokens=node_tokens, node_bbox=node_bbox, node_mask=node_mask,
            edge_src=edge_src, edge_dst=edge_dst, edge_token=edge_token,
            edge_sign=edge_sign, edge_mask=edge_mask,
            qst_tokens=q_ids, qst_mask=q_mask, labels=labels,
            sample_mask=sample_mask,
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


def iterate_batches(
    dataset,
    collator: Collator,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
    pad_shards: bool = True,
) -> Iterator[tuple[GraphBatch, BatchMeta]]:
    """Fixed-shape batch iterator with DistributedSampler-like sharding
    (reference ``datasets/build.py:44-53``): each data-parallel process
    takes a strided slice of the (optionally shuffled) index list.  As
    in ``DistributedSampler``, the index list is wrap-padded to a
    multiple of ``num_shards`` so every process sees the same number of
    samples — and therefore issues the same number of (collective-
    bearing) steps in multi-host SPMD.

    ``pad_shards=False`` skips the wrap-pad so shards partition the
    dataset *exactly* (per-host sample counts may then differ by one) —
    for metrics-only eval loops where a duplicated tail sample would
    skew reduced sums; lock-step training keeps the default."""
    b = collator.spec.batch_size
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    if num_shards > 1 and pad_shards:
        pad = (-len(idx)) % num_shards
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
    idx = idx[shard_index::num_shards]
    n_full = len(idx) // b
    for i in range(n_full):
        chunk = idx[i * b:(i + 1) * b]
        yield collator.collate([dataset[int(j)] for j in chunk])
    rem = len(idx) - n_full * b
    if rem and not drop_last:
        chunk = idx[n_full * b:]
        yield collator.collate([dataset[int(j)] for j in chunk])


def _norm_bucket_key(k):
    # bare int keys carry no question-length constraint: order them
    # after same-node-cap tuple keys (least specific last)
    return k if isinstance(k, tuple) else (k, float("inf"))


def route_to_buckets(dataset, collators: dict, idx=None) -> dict:
    """Route sample indices to size buckets: each sample goes to the
    smallest bucket whose node, edge, *and* question-length caps fit
    it; the largest bucket is the truncating fallback.  Returns
    ``{bucket key: [sample index, ...]}`` over ``idx`` (default: the
    whole dataset, in order).

    This is THE routing rule — :func:`iterate_batches_bucketed` and
    ``bench.py`` both call it, so the benchmark always measures the
    bucket distribution the Trainer ships.

    Routing only needs per-sample sizes; they are extracted once and
    cached on the dataset object (keyed by tokenizer identity), so
    multi-host epochs don't re-fetch/re-tokenize the full set per host
    per epoch.
    """
    caps = sorted(collators.keys(), key=_norm_bucket_key)
    any_qlen = any(isinstance(k, tuple) for k in caps)
    if idx is None:
        idx = range(len(dataset))

    # every collator shares one tokenizer, so the (BPE) token count is
    # computed once per sample
    tok = collators[caps[0]].tokenizer
    cache = getattr(dataset, "_route_size_cache", None)
    if not (cache and cache[0] is tok and cache[1] == any_qlen
            and len(cache[2]) == len(dataset)):
        sizes = np.empty((len(dataset), 3), dtype=np.int64)
        for j in range(len(dataset)):
            s = dataset[j]
            g = s.graph
            sizes[j] = (g.num_nodes, g.edge_src.shape[0],
                        tok.count_tokens(s.question) if any_qlen else 0)
        cache = (tok, any_qlen, sizes)
        try:
            dataset._route_size_cache = cache
        except AttributeError:           # read-only dataset object
            pass
    sizes = cache[2]

    per_bucket: dict = {c: [] for c in caps}
    for j in idx:
        n, e, q = (int(sizes[j, 0]), int(sizes[j, 1]), int(sizes[j, 2]))
        for key in caps:
            spec = collators[key].spec
            # the question-length check applies to bare-int keys too
            # (their spec still has a question_len): a long question
            # must fall through to the largest bucket, never be
            # silently truncated by a small one
            if (n <= spec.max_nodes_per_graph
                    and e <= spec.max_edges_per_graph
                    and (not any_qlen or q <= spec.question_len)):
                per_bucket[key].append(int(j))
                break
        else:
            per_bucket[caps[-1]].append(int(j))
    return per_bucket


def iterate_batches_bucketed(
    dataset,
    collators: dict,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    shard_index: int = 0,
    num_shards: int = 1,
    pad_shards: bool = True,
    group_by_bucket: bool = False,
) -> Iterator[tuple[GraphBatch, BatchMeta]]:
    """Size-bucketed iteration: each sample goes to the smallest bucket
    whose node, edge, *and* question-length caps fit it, so small
    graphs don't pay the largest graph's padding and short questions
    don't pay the longest question's transformer FLOPs.

    ``collators`` maps bucket key -> Collator (one jit specialization
    per bucket).  Keys are ``(node_cap, question_len_cap)`` tuples
    (:func:`~isubgvqa_tpu.data.build.build_bucket_collators`); bare
    node-cap int keys are also accepted — when mixed with tuple keys
    their spec's ``question_len`` still gates routing, so a long
    question never silently truncates into an int-key bucket (with
    only int keys, token counts are not computed and question length
    plays no part).  Buckets are tried in ascending (node, qlen)
    order; the last (largest) bucket is the truncating fallback.

    Multi-host SPMD: routing is deterministic given the full index
    list, so every host computes the **same global bucket schedule**
    and takes its stride within it.  Batches are grouped into
    same-shape *rounds* of ``num_shards`` (each bucket's batch list is
    wrap-padded to a multiple of ``num_shards``, DistributedSampler
    semantics); host ``shard_index`` collates the round's
    ``shard_index``-th batch.  All hosts therefore issue identical
    batch-shape sequences and equal step counts — safe for lock-step
    steps that carry cross-host collectives.  Pinned by
    ``tests/test_bucketed_batching.py::test_sharded_bucketing_lockstep``.

    ``pad_shards=False`` skips the wrap-pad: shards then partition the
    dataset *exactly* (no duplicated tail chunks) at the cost of
    unequal per-host step counts.  Use for metrics-only eval loops with
    no per-step collectives (the explain runner), where duplicate
    samples would skew sums; lock-step training must keep the default.

    ``group_by_bucket=True`` keeps the round order grouped per bucket
    even under ``shuffle`` (which then only randomizes batch
    *composition*): every bucket switch re-dispatches a different
    executable, which costs a device sync — through the sandbox
    tunnel ~0.3 s each, so a randomly interleaved epoch of B batches
    pays ~B syncs where a grouped one pays ``num_buckets``.  Use for
    order-free eval/benchmark loops; training keeps interleaved order
    (grouped order would feed the optimizer all small graphs before
    all large ones every epoch).
    """
    caps = sorted(collators.keys(), key=_norm_bucket_key)
    # the FULL index list on every host — sharding happens on the
    # schedule below, never on the samples, so hosts agree on it
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    per_bucket = route_to_buckets(dataset, collators, idx)

    rng = np.random.default_rng(seed + 1)
    # rounds: ``num_shards`` same-bucket chunks; every host walks the
    # same round sequence and takes its own chunk
    rounds = []
    for cap in caps:
        b = collators[cap].spec.batch_size
        members = per_bucket[cap]
        n_full = len(members) // b
        chunks = [members[i * b:(i + 1) * b] for i in range(n_full)]
        rem = members[n_full * b:]
        if rem and not drop_last:
            chunks.append(rem)
        if not chunks:
            continue
        if pad_shards:
            pad = (-len(chunks)) % num_shards
            chunks += [chunks[i % len(chunks)] for i in range(pad)]  # wrap
        for i in range(0, len(chunks), num_shards):
            rounds.append((cap, chunks[i:i + num_shards]))
    if shuffle and not group_by_bucket:
        rng.shuffle(rounds)
    for cap, group in rounds:
        if shard_index < len(group):
            yield collators[cap].collate(
                [dataset[t] for t in group[shard_index]])


def group_multistep(iterator: Iterator, k: int) -> Iterator:
    """Group consecutive same-shape ``(batch, meta)`` pairs into
    stacked multi-step super-batches for
    :func:`~isubgvqa_tpu.train.steps.make_multistep_train_step`.

    Yields ``("multi", stacked_batch, metas)`` once ``k`` batches of
    one static shape have accumulated — ``stacked_batch`` is the
    element-wise ``np.stack`` of the k batches (leading ``[K]`` axis) —
    and flushes whatever is left per shape at end of stream as plain
    ``("single", batch, meta)`` items, so remainders never force a
    separately-compiled scan length.

    Grouping is deterministic in stream order.  Under multi-host SPMD
    the bucketed iterator already gives every host an identical
    batch-shape sequence (``iterate_batches_bucketed``), so all hosts
    produce the same multi/single dispatch sequence and stay in
    lock-step.
    """
    if k <= 1:
        for batch, meta in iterator:
            yield ("single", batch, meta)
        return

    def shape_key(b: GraphBatch):
        return (b.node_tokens.shape, b.edge_src.shape, b.qst_tokens.shape)

    pending: dict = {}
    order: list = []                      # flush in first-seen order
    for batch, meta in iterator:
        key = shape_key(batch)
        if key not in pending:
            pending[key] = []
            order.append(key)
        pending[key].append((batch, meta))
        if len(pending[key]) == k:
            group = pending.pop(key)
            order.remove(key)
            bs = [b for b, _ in group]
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *bs)
            yield ("multi", stacked, tuple(m for _, m in group))
    for key in order:
        for batch, meta in pending[key]:
            yield ("single", batch, meta)


def prefetch(iterator: Iterator, depth: int = 2, device=None) -> Iterator:
    """Run ``iterator`` in a background thread, keeping up to ``depth``
    ready batches in a queue — the host collates the next batch while
    the device executes the current step (the reference gets this from
    torch DataLoader workers + pin_memory, ``datasets/build.py:70-90``).
    Exceptions in the producer re-raise at the consuming site.  When
    the consumer stops early (``break``, exception, generator close),
    the producer is signalled and exits instead of parking on the
    queue with buffered batches for the life of the process.

    ``device``: optionally ``jax.device_put`` each yielded item's first
    element (the batch of a ``(batch, meta)`` pair, or the item itself)
    onto that device *in the producer thread*, so the host→device copy
    overlaps with the consumer's dispatch instead of serializing with
    it (the reference's ``pin_memory=True`` + ``.to(device)`` split
    plays the same role)."""
    import queue
    import threading

    def put_on_device(item):
        if device is None:
            return item
        if callable(device) and not hasattr(device, "device_set"):
            # custom placer (e.g. the Trainer's multistep placer, which
            # shards stacked [K, B, ...] and single [B, ...] batches
            # differently)
            return device(item)
        if isinstance(item, tuple) and len(item) == 2:
            batch, meta = item
            return jax.device_put(batch, device), meta
        return jax.device_put(item, device)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def guarded_put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not guarded_put(put_on_device(item)):
                    return
            guarded_put(_END)
        except BaseException as exc:        # noqa: BLE001 — re-raised
            guarded_put(exc)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:                               # unblock a parked producer
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
