"""Size-bucketed batching: small graphs go to the small bucket."""

import numpy as np

from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.data.batching import iterate_batches_bucketed


def test_bucketed_iteration_covers_all_and_respects_caps():
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=40, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    seen = []
    small_batches = big_batches = 0
    for batch, meta in iterate_batches_bucketed(ds, collators, shuffle=True,
                                                seed=3):
        seen.extend(meta.question_ids)
        cap = batch.max_nodes_per_graph
        if cap == 8:
            small_batches += 1
            # every graph in the small bucket fits without truncation
            for g in meta.graphs:
                assert g.num_nodes <= 8
        else:
            big_batches += 1
    assert len(set(seen)) == 40
    assert big_batches >= 1   # synthetic graphs go up to 24 nodes
    # shapes differ per bucket but are static within one
    shapes = set()
    for batch, _ in iterate_batches_bucketed(ds, collators):
        shapes.add(batch.node_tokens.shape)
    assert len(shapes) <= 2


def test_bucket_selection_respects_edge_cap():
    """A graph whose nodes fit the small bucket but whose edges exceed
    its edge cap must overflow to the larger bucket (no truncation)."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=40, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                    max_edges_per_graph=10,  # tight
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    for batch, meta in iterate_batches_bucketed(ds, collators):
        if batch.max_nodes_per_graph == 8:
            for g in meta.graphs:
                assert g.num_nodes <= 8 and g.edge_src.shape[0] <= 10


def test_build_datasets_bucket_collators_default_on():
    """Config default wires (16, 32, 64, max)x(16, max) buckets into
    the bundle; small buckets get the 4x-nodes edge budget."""
    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data.build import build_datasets

    cfg = Config(synthetic=True, synthetic_size=32, batch_size=4,
                 num_answers=32, text_vocab_size=256, question_len=24,
                 meta_dir="")
    bundle = build_datasets(cfg)
    for split in ("train", "dev", "testdev"):
        caps = sorted(bundle.bucket_collators[split])
        assert caps == [(16, 16), (16, 24), (32, 16), (32, 24),
                        (64, 16), (64, 24), (128, 16), (128, 24)]
        colls = bundle.bucket_collators[split]
        assert colls[(16, 16)].spec.max_edges_per_graph == 64
        assert colls[(64, 16)].spec.max_edges_per_graph == 256
        assert colls[(32, 16)].spec.max_edges_per_graph == 128
        assert colls[(128, 24)].spec.max_edges_per_graph == 384
        assert colls[(32, 16)].spec.question_len == 16
        # the plain collator is the largest bucket's
        assert bundle.collators[split] is colls[(128, 24)]
    # eval batch x4 carries into every bucket (datasets/build.py:55-67)
    assert all(c.spec.batch_size == 16
               for c in bundle.bucket_collators["dev"].values())


def test_mixed_int_and_tuple_keys_sort():
    """Bare int keys order after same-node-cap tuple keys instead of
    raising on int-vs-None comparison."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=12, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        (32, 12): Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                           max_edges_per_graph=160,
                                           question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    seen = 0
    for batch, meta in iterate_batches_bucketed(ds, collators):
        seen += meta.num_real
    assert seen == 12


def test_sharded_iteration_equal_lengths():
    """DistributedSampler parity: wrap-padding gives every shard the
    same number of samples (and therefore steps)."""
    from isubgvqa_tpu.data.batching import iterate_batches

    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=13, seed=0)   # 13 % 4 != 0
    tok = HashWordTokenizer(max_len=12)
    coll = Collator(tok, BucketSpec(2, max_nodes_per_graph=32,
                                    max_edges_per_graph=160,
                                    question_len=12), vocab=vocab)
    counts = []
    for shard in range(4):
        n = sum(m.num_real for _, m in iterate_batches(
            ds, coll, shard_index=shard, num_shards=4))
        counts.append(n)
    assert len(set(counts)) == 1           # equal work per process
    assert sum(counts) >= 13               # every sample covered


def test_prefetch_preserves_order_and_raises():
    from isubgvqa_tpu.data.batching import prefetch

    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="producer failed"):
        next(it)

    # early consumer stop must not deadlock, and closing the generator
    # must release the producer thread (no parked daemon per call)
    import threading
    import time

    before = threading.active_count()
    it = prefetch(iter(range(1000)), depth=2)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_prefetch_device_transfer():
    """``device=`` moves host→device placement into the producer
    thread: ``(batch, meta)`` pairs get their batch placed (meta stays
    host-side), bare items are placed whole."""
    import jax
    import numpy as np
    from isubgvqa_tpu.data.batching import prefetch

    dev = jax.devices()[0]

    def gen():
        for i in range(3):
            yield ({"x": np.full((2, 2), i, np.float32)}, f"meta{i}")

    out = list(prefetch(gen(), device=dev))
    assert [m for _, m in out] == ["meta0", "meta1", "meta2"]
    for i, (b, _) in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert b["x"].devices() == {dev}
        assert float(b["x"][0, 0]) == i

    bare = list(prefetch(iter([np.ones((2,), np.float32)]), device=dev))
    assert isinstance(bare[0], jax.Array) and bare[0].devices() == {dev}


def test_question_len_bucket_routing():
    """Short questions ride the short-question bucket; long ones
    overflow to the longer cap (the reference's per-batch dynamic
    padding, gqa.py:253-258, as static buckets)."""
    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data.build import build_datasets

    cfg = Config(synthetic=True, synthetic_size=48, batch_size=4,
                 num_answers=32, text_vocab_size=256, question_len=32,
                 meta_dir="")
    bundle = build_datasets(cfg)
    ds = bundle.datasets["train"]
    tok = bundle.tokenizer
    seen_qlens = set()
    for batch, meta in iterate_batches_bucketed(
            ds, bundle.bucket_collators["train"]):
        L = batch.qst_tokens.shape[1]
        seen_qlens.add(L)
        for q in meta.questions:
            assert tok.count_tokens(q) <= L
    # synthetic questions are all short -> everything at the 16 cap
    assert seen_qlens == {16}


def test_int_key_bucket_never_truncates_long_questions():
    """Mixed int/tuple keys: a question longer than an int-key bucket's
    question_len must fall through to a larger bucket rather than be
    silently truncated (the tuple-key path already refused this)."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=24, seed=0)
    tok = HashWordTokenizer(max_len=32)
    collators = {
        8: Collator(tok, BucketSpec(2, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=2),   # too short for all
                    vocab=vocab),
        (32, 32): Collator(tok, BucketSpec(2, max_nodes_per_graph=32,
                                           max_edges_per_graph=160,
                                           question_len=32), vocab=vocab),
    }
    seen = 0
    for batch, meta in iterate_batches_bucketed(ds, collators):
        seen += meta.num_real
        L = batch.qst_tokens.shape[1]
        for q in meta.questions:
            # no sample rides a bucket whose cap its question exceeds
            assert tok.count_tokens(q) <= L
    assert seen == 24


def test_sharded_bucketing_lockstep():
    """Multi-host bucketing: every shard must issue the IDENTICAL
    batch-shape sequence (lock-step SPMD requirement), equal step
    counts, and the union of shards must cover the dataset."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=41, seed=0)   # odd on purpose
    tok = HashWordTokenizer(max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    shapes, qids, counts = [], set(), []
    for shard in range(2):
        seq = []
        n = 0
        for batch, meta in iterate_batches_bucketed(
                ds, collators, shuffle=True, seed=5,
                shard_index=shard, num_shards=2):
            seq.append((batch.node_tokens.shape, batch.edge_src.shape,
                        batch.qst_tokens.shape))
            qids.update(meta.question_ids)
            n += 1
        shapes.append(seq)
        counts.append(n)
    assert counts[0] == counts[1] and counts[0] > 0
    assert shapes[0] == shapes[1], "hosts must issue identical shapes"
    assert len(qids) == 41, "every sample covered across shards"


def test_sharded_bucketing_matches_unsharded_coverage():
    """num_shards=1 stays byte-identical to the previous behavior
    (same shuffle stream), and 4-way sharding still covers all."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=24, seed=0)
    tok = HashWordTokenizer(max_len=12)

    def make_collators():
        return {
            8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                        max_edges_per_graph=48,
                                        question_len=12), vocab=vocab),
            32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                         max_edges_per_graph=160,
                                         question_len=12), vocab=vocab),
        }

    qids = set()
    counts = []
    for shard in range(4):
        n = 0
        for batch, meta in iterate_batches_bucketed(
                ds, make_collators(), shard_index=shard, num_shards=4):
            qids.update(meta.question_ids)
            n += 1
        counts.append(n)
    assert len(set(counts)) == 1
    assert len(qids) == 24


def test_pad_shards_false_partitions_exactly():
    """pad_shards=False (the explain runner's metrics mode) must
    partition the dataset exactly across shards: every sample appears
    exactly once in the union, none twice — even when a bucket's chunk
    count is odd (where the lock-step default would wrap-pad a
    duplicate chunk)."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=41, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    seen = []
    for shard in range(2):
        for batch, meta in iterate_batches_bucketed(
                ds, collators, shuffle=True, seed=5,
                shard_index=shard, num_shards=2, pad_shards=False):
            seen.extend(meta.question_ids[:meta.num_real])
    assert len(seen) == 41, "no duplicates, no drops"
    assert len(set(seen)) == 41


def test_iterate_batches_exact_partition_without_pad():
    """The fixed-shape iterator's ``pad_shards=False``: shards
    partition an odd-size dataset exactly (no wrap-padded duplicate
    tail samples — those would double-count into metrics-only eval
    sums, explain/runner.py)."""
    from isubgvqa_tpu.data.batching import iterate_batches

    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=7, seed=0)
    tok = HashWordTokenizer(max_len=12)
    coll = Collator(tok, BucketSpec(2, max_nodes_per_graph=32,
                                    max_edges_per_graph=160,
                                    question_len=12), vocab=vocab)
    seen = []
    for shard in range(2):
        for batch, meta in iterate_batches(ds, coll, shard_index=shard,
                                           num_shards=2, pad_shards=False):
            seen.extend(meta.question_ids[:meta.num_real])
    assert len(seen) == 7, "no duplicates, no drops"
    assert len(set(seen)) == 7
    # default (lock-step training) keeps DistributedSampler wrap-pad
    padded = []
    for shard in range(2):
        for batch, meta in iterate_batches(ds, coll, shard_index=shard,
                                           num_shards=2):
            padded.extend(meta.question_ids[:meta.num_real])
    assert len(padded) == 8   # one wrapped duplicate


def test_route_size_cache_avoids_refetch():
    """route_to_buckets caches per-sample sizes on the dataset: the
    second epoch routes without re-tokenizing every question (the
    multi-host O(N)-per-host-per-epoch fix)."""
    from isubgvqa_tpu.data.batching import route_to_buckets

    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=12, seed=0)
    tok = HashWordTokenizer(max_len=12)
    calls = {"n": 0}
    orig = tok.count_tokens

    def counting(text):
        calls["n"] += 1
        return orig(text)

    tok.count_tokens = counting
    collators = {
        (8, 12): Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                          max_edges_per_graph=48,
                                          question_len=12), vocab=vocab),
        (32, 12): Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                           max_edges_per_graph=160,
                                           question_len=12), vocab=vocab),
    }
    first = route_to_buckets(ds, collators)
    n_after_first = calls["n"]
    assert n_after_first == 12
    second = route_to_buckets(ds, collators)
    assert calls["n"] == n_after_first, "cached sizes must be reused"
    assert first == second


def test_group_by_bucket_contiguous_and_complete():
    """group_by_bucket=True: shuffled composition, but each bucket's
    batches are emitted in one contiguous block (eval/bench loops pay
    one executable switch per bucket, not per batch)."""
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=40, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(4, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                     max_edges_per_graph=160,
                                     question_len=12), vocab=vocab),
    }
    caps_seen, qids = [], []
    for batch, meta in iterate_batches_bucketed(
            ds, collators, shuffle=True, seed=3, group_by_bucket=True):
        caps_seen.append(batch.max_nodes_per_graph)
        qids.extend(meta.question_ids)
    # contiguous blocks: number of cap transitions == distinct caps - 1
    transitions = sum(1 for a, b in zip(caps_seen, caps_seen[1:])
                      if a != b)
    assert transitions == len(set(caps_seen)) - 1
    # same coverage as the interleaved order
    qids_interleaved = []
    for _, meta in iterate_batches_bucketed(ds, collators, shuffle=True,
                                            seed=3):
        qids_interleaved.extend(meta.question_ids)
    assert sorted(qids) == sorted(qids_interleaved)
    assert len(set(qids)) == 40
