"""Native C++ collate fill: exact parity with the pure-Python path.

The Python loop in ``Collator.collate`` is the semantic oracle (it is
itself golden-tested against the reference's PyG batching semantics in
test_data.py / test_bucketed_batching.py); the native kernel
(isubgvqa_tpu/native/csrc/collate.cpp) must reproduce it bit-for-bit —
including node/edge truncation and the truncation counters.
"""

import threading

import numpy as np
import pytest

import jax

from isubgvqa_tpu.data.batching import BucketSpec, Collator
from isubgvqa_tpu.data.gqa import Sample
from isubgvqa_tpu.data.scene_graph import GraphArrays
from isubgvqa_tpu.data.tokenizer import HashWordTokenizer
from isubgvqa_tpu.native import PackedGraphStore, load_collate_lib
from isubgvqa_tpu.native.build import build_and_load


def _rand_graph(rng, n_nodes, n_edges) -> GraphArrays:
    return GraphArrays(
        node_tokens=rng.integers(0, 500, (n_nodes, 4)).astype(np.int32),
        node_bbox=rng.uniform(0, 1, (n_nodes, 4)).astype(np.float32),
        edge_src=rng.integers(0, n_nodes, (n_edges,)).astype(np.int32),
        edge_dst=rng.integers(0, n_nodes, (n_edges,)).astype(np.int32),
        edge_token=rng.integers(0, 500, (n_edges,)).astype(np.int32),
        edge_sign=rng.choice([1.0, -1.0], (n_edges,)).astype(np.float32),
    )


def _samples(rng, graphs):
    return [
        Sample(question_id=f"q{i}", graph=g,
               question=f"is there a thing number {i} here?",
               qst_type={"structural": "verify"},
               label=int(rng.integers(0, 100)), image_id=f"img{i}")
        for i, g in enumerate(graphs)
    ]


@pytest.fixture(scope="module")
def lib():
    lib = load_collate_lib()
    assert lib is not None, (
        "native collate kernel failed to build/load — the g++ toolchain "
        "is part of the environment, so this is a real regression")
    return lib


def _assert_batches_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("n_cap,e_cap", [(8, 24), (4, 6)])
def test_native_matches_python_including_truncation(lib, n_cap, e_cap):
    rng = np.random.default_rng(0)
    # graph sizes straddle the caps: some fit, some truncate nodes,
    # some truncate edges only
    sizes = [(2, 3), (8, 24), (11, 40), (4, 30), (6, 5), (8, 2)]
    graphs = [_rand_graph(rng, n, e) for n, e in sizes]
    samples = _samples(rng, graphs)
    tok = HashWordTokenizer(max_len=16)
    spec = BucketSpec(batch_size=8, max_nodes_per_graph=n_cap,
                      max_edges_per_graph=e_cap, question_len=16)
    nat = Collator(tok, spec, packed_store=PackedGraphStore())
    py = Collator(tok, spec)
    assert nat._native_lib is not None

    b_nat, m_nat = nat.collate(samples)       # num_real < batch_size
    b_py, m_py = py.collate(samples)
    _assert_batches_equal(b_nat, b_py)
    assert nat.truncated_nodes == py.truncated_nodes
    assert nat.truncated_edges == py.truncated_edges
    assert m_nat.num_real == m_py.num_real == len(samples)
    assert [id(g) for g in m_nat.graphs] == [id(g) for g in m_py.graphs]

    # second batch through the same store: rows are dict hits, counters
    # keep accumulating identically
    b_nat2, _ = nat.collate(samples[:3])
    b_py2, _ = py.collate(samples[:3])
    _assert_batches_equal(b_nat2, b_py2)
    assert (nat.truncated_nodes, nat.truncated_edges) == \
           (py.truncated_nodes, py.truncated_edges)


def test_packed_store_rows_stable_across_growth(lib):
    rng = np.random.default_rng(1)
    store = PackedGraphStore()
    g0 = _rand_graph(rng, 5, 9)
    r0 = store.rows([g0])[0]
    # force many growth cycles
    more = [_rand_graph(rng, 60, 200) for _ in range(40)]
    store.rows(more)
    assert store.rows([g0])[0] == r0
    np.testing.assert_array_equal(
        store.node_tokens[store.node_off[r0]:store.node_off[r0 + 1]],
        g0.node_tokens)
    np.testing.assert_array_equal(
        store.edge_src[store.edge_off[r0]:store.edge_off[r0 + 1]],
        g0.edge_src)


def test_concurrent_collate_threads_share_one_store(lib):
    rng = np.random.default_rng(2)
    tok = HashWordTokenizer(max_len=16)
    spec = BucketSpec(batch_size=4, max_nodes_per_graph=16,
                      max_edges_per_graph=48, question_len=16)
    store = PackedGraphStore()
    graphs = [_rand_graph(rng, int(rng.integers(2, 16)),
                          int(rng.integers(1, 40))) for _ in range(64)]
    samples = _samples(rng, graphs)
    oracle = Collator(tok, spec)
    expected = [oracle.collate(samples[i:i + 4])[0] for i in range(0, 64, 4)]

    results = [None] * 16
    errors = []

    def work(t):
        try:
            coll = Collator(tok, spec, packed_store=store)
            for i in range(t, 16, 4):
                results[i] = coll.collate(samples[4 * i:4 * i + 4])[0]
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for got, want in zip(results, expected):
        _assert_batches_equal(got, want)


def test_native_kill_switch(monkeypatch):
    monkeypatch.setenv("ISUBGVQA_NATIVE", "0")
    assert build_and_load("collate") is None
    coll = Collator(HashWordTokenizer(max_len=16),
                    BucketSpec(batch_size=2, max_nodes_per_graph=4,
                               max_edges_per_graph=6, question_len=16))
    assert coll._native_lib is None   # default path stays pure Python


def test_build_datasets_uses_native_collators():
    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data.build import build_datasets
    cfg = Config(synthetic=True, synthetic_size=32, batch_size=8)
    data = build_datasets(cfg)
    colls = [c for d in data.bucket_collators.values() for c in d.values()]
    assert all(c._native_lib is not None for c in colls)
    # one shared store across every split and bucket
    stores = {id(c._packed) for c in colls}
    assert len(stores) == 1
    batch, meta = colls[0].collate([data.datasets["train"][0]])
    assert meta.num_real == 1


def test_tokenizer_encode_cache_is_safe():
    tok = HashWordTokenizer(max_len=8)
    text = "a very long question with many many words to overflow?"
    first = list(tok.encode(text))
    ids, mask = tok(text, max_len=4)       # forces in-place eos rewrite
    assert ids[0, -1] == tok.eos_id
    assert list(tok.encode(text)) == first  # cache entry not mutated
    assert tok.count_tokens(text) == len(first)


def test_serve_store_is_request_scoped():
    """A long-running Predictor must not accumulate per-request graphs
    in a shared PackedGraphStore (serve.py:_collators builds a fresh
    store per predict call)."""
    from isubgvqa_tpu.serve import Predictor

    c1 = Predictor._collators.__wrapped__ if hasattr(
        Predictor._collators, "__wrapped__") else None
    assert c1 is None  # not cached/memoized

    class _Stub(Predictor):
        def __init__(self):       # bypass checkpoint loading
            from isubgvqa_tpu.config import Config
            from isubgvqa_tpu.data.tokenizer import HashWordTokenizer
            from isubgvqa_tpu.data.vocab import SceneGraphVocab
            self.cfg = Config(synthetic=True, meta_dir="")
            self.vocab = SceneGraphVocab.synthetic()
            self.tokenizer = HashWordTokenizer(max_len=16)

    p = _Stub()
    colls_a = p._collators(4)
    colls_b = p._collators(4)
    store_a = next(iter(colls_a.values()))._packed
    store_b = next(iter(colls_b.values()))._packed
    assert store_a is not None and store_b is not None
    assert store_a is not store_b
