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
