"""Data-layer tests: vocab quirks, scene-graph conversion semantics,
tokenization, and fixed-shape batching."""

import numpy as np
import pytest

from isubgvqa_tpu.data import (
    SceneGraphVocab,
    HashWordTokenizer,
    convert_scene_graph,
    AnswerMap,
    SyntheticGQA,
    Collator,
    BucketSpec,
)
from isubgvqa_tpu.data.batching import iterate_batches
from isubgvqa_tpu.data.scene_graph import EMPTY_SG_6, SceneGraphStore

META_DIR = "/root/reference/ISubGVQA/meta_info"


@pytest.fixture(scope="module")
def vocab():
    return SceneGraphVocab.synthetic()


def test_vocab_specials_order(vocab):
    assert vocab.itos[:5] == ["<unk>", "<pad>", "<sos>", "<eos>", "<self>"]
    assert vocab.pad_index == 1
    assert vocab.self_index == 4


def test_vocab_from_meta_dir_if_available():
    import os

    if not os.path.isdir(META_DIR):
        pytest.skip("reference meta assets not mounted")
    v = SceneGraphVocab.from_meta_dir(META_DIR)
    assert v.itos[:5] == ["<unk>", "<pad>", "<sos>", "<eos>", "<self>"]
    assert "pokemon" in v.stoi
    assert "<self>" not in v.itos[5:]  # special kept only once
    # padding embedding row is zero
    assert np.allclose(v.vectors[v.pad_index], 0.0)


def test_convert_scene_graph_self_loops_and_symmetry(vocab):
    sg = {
        "objects": {
            "0": {"name": "obj0", "attributes": ["attr0", "attr1"],
                  "relations": [{"object": "1", "name": "rel0"}]},
            "1": {"name": "obj1", "attributes": [], "relations": []},
        }
    }
    g = convert_scene_graph(sg, vocab)
    assert g.num_nodes == 2
    # edges: self0, 0->1, added 1->0, self1
    assert g.num_edges == 4
    self_edges = (g.edge_src == g.edge_dst)
    assert self_edges.sum() == 2
    assert (g.edge_token[self_edges] == vocab.self_index).all()
    # the added reverse edge is sign-flagged
    added = g.edge_sign < 0
    assert added.sum() == 1
    assert g.edge_src[added][0] == 1 and g.edge_dst[added][0] == 0
    # node token layout: name + attrs + pad
    assert g.node_tokens[0, 0] == vocab.stoi["obj0"]
    assert g.node_tokens[0, 1] == vocab.stoi["attr0"]
    assert g.node_tokens[0, 3] == vocab.pad_index
    assert g.node_tokens[1, 1] == vocab.pad_index


def test_convert_empty_graph_uses_dummy(vocab):
    g = convert_scene_graph({"objects": {}}, vocab)
    assert g.num_nodes == 2
    assert g.num_edges == 4  # 2 self loops + 1 rel + 1 sym... (0->1 and 1->0 both present)


def test_store_fallback_for_unknown_image(vocab):
    store = SceneGraphStore(vocab, graphs={})
    g = store.query("nope")
    ref = convert_scene_graph(EMPTY_SG_6, vocab)
    assert g.num_nodes == ref.num_nodes == 6
    np.testing.assert_array_equal(g.node_tokens, ref.node_tokens)


def test_tokenizer_fixed_shapes():
    tok = HashWordTokenizer(max_len=16)
    ids, mask = tok(["what color is the cat?", "is there a dog"])
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids[0, 0] == tok.bos_id
    n0 = mask[0].sum()
    assert ids[0, n0 - 1] == tok.eos_id
    assert (ids[0, n0:] == tok.pad_id).all()
    # deterministic
    ids2, _ = tok(["what color is the cat?", "is there a dog"])
    np.testing.assert_array_equal(ids, ids2)


def test_answer_map_bottle_cap_remap():
    am = AnswerMap.synthetic()
    assert am.label_of("bottle cap") == am.label_of("bottle")


def test_collate_shapes_and_masks(vocab):
    answers = AnswerMap.synthetic(64)
    ds = SyntheticGQA(vocab, answers, size=32, seed=0)
    spec = BucketSpec(batch_size=8, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=16)
    coll = Collator(HashWordTokenizer(max_len=16), spec, vocab=vocab)
    batch, meta = coll.collate([ds[i] for i in range(8)])

    assert batch.node_tokens.shape == (8, 32, 4)
    assert batch.edge_src.shape == (8, 128)
    assert batch.qst_tokens.shape == (8, 16)
    nm = np.asarray(batch.node_mask)
    assert nm.sum() == sum(min(g.num_nodes, 32) for g in meta.graphs)
    # per-graph real nodes fill a prefix
    for gi in range(8):
        n = nm[gi].sum()
        assert nm[gi, :n].all() and not nm[gi, n:].any()
    # edges reference real in-graph node positions
    em = np.asarray(batch.edge_mask)
    es = np.asarray(batch.edge_src)
    ed = np.asarray(batch.edge_dst)
    for gi in range(8):
        n = nm[gi].sum()
        assert (es[gi][em[gi]] < n).all() and (ed[gi][em[gi]] < n).all()
    # self loops present per node
    for gi in range(8):
        self_edges = (es[gi] == ed[gi]) & em[gi]
        assert self_edges.sum() >= nm[gi].sum()


def test_iterate_batches_sharding(vocab):
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=50, seed=1)
    spec = BucketSpec(batch_size=4, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=16)
    coll = Collator(HashWordTokenizer(max_len=16), spec, vocab=vocab)
    seen = set()
    for shard in range(2):
        for batch, meta in iterate_batches(ds, coll, shuffle=True, seed=7,
                                           shard_index=shard, num_shards=2,
                                           drop_last=True):
            assert batch.qst_tokens.shape == (4, 16)
            seen.update(meta.question_ids)
    assert len(seen) == 48  # 50 -> 25/25 per shard -> 24 each kept
    # partial final batch is padded and masked
    batches = list(iterate_batches(ds, coll, drop_last=False))
    last, last_meta = batches[-1]
    assert last_meta.num_real == 50 % 4 or last_meta.num_real == 4
    assert np.asarray(last.sample_mask).sum() == last_meta.num_real
