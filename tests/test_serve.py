"""Serving API: checkpoint round-trip into a Predictor and batched
question answering with explanation subgraphs."""

import dataclasses

import numpy as np
import pytest

from isubgvqa_tpu.data.build import build_datasets
from isubgvqa_tpu.models.build import build_model
from isubgvqa_tpu.serve import Predictor
from isubgvqa_tpu.train.checkpoint import CheckpointManager
from isubgvqa_tpu.train.loop import Trainer

from test_model import small_cfg


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    out = tmp_path_factory.mktemp("serve_ckpt")
    cfg = dataclasses.replace(small_cfg(), synthetic=True, synthetic_size=16,
                              meta_dir="", epochs=0, output_dir=str(out))
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)
    trainer.ckpt.save("checkpoint_top_res", trainer.state, epoch=0, cfg=cfg)
    return str(out / "checkpoint_top_res")


def test_predictor_end_to_end(ckpt):
    predictor = Predictor.from_checkpoint(ckpt, meta_dir="")
    sg = {
        "objects": {
            "0": {"name": "obj0", "attributes": ["attr0"],
                  "relations": [{"object": "1", "name": "rel0"}],
                  "x1": 0, "y1": 0, "x2": 10, "y2": 10},
            "1": {"name": "obj1", "attributes": [],
                  "relations": [], "x1": 5, "y1": 5, "x2": 15, "y2": 15},
        }
    }
    results = predictor.predict(
        ["what is next to the obj0?", "is there an obj1?"], [sg, sg],
        batch_size=2)
    assert len(results) == 2
    r = results[0]
    assert isinstance(r.answer, str)
    assert 0.0 <= r.confidence <= 1.0
    assert len(r.top_answers) == 5
    assert abs(sum(p for _, p in r.top_answers) - 1.0) < 1.0
    assert r.node_mask.shape == (2,)
    assert set(r.subgraph_nodes) <= {"obj0", "obj1"}
    # deterministic across calls
    r2 = predictor.predict(["what is next to the obj0?"], [sg])[0]
    assert r2.answer == r.answer


def test_predictor_partial_batch(ckpt):
    predictor = Predictor.from_checkpoint(ckpt, meta_dir="")
    sg = {"objects": {}}
    results = predictor.predict(["q?"] * 3, [sg] * 3, batch_size=2)
    assert len(results) == 3


def test_predict_folds_rng_per_batch(ckpt):
    """Each batch of a large request gets its own folded PRNG key, so
    noisy-eval samplers draw fresh noise per batch (the old code
    passed one identical key to every chunk's forward)."""
    predictor = Predictor.from_checkpoint(ckpt, meta_dir="")
    seen_keys = []
    orig_forward = predictor._forward

    def spy(params, batch_stats, batch, key):
        seen_keys.append(np.asarray(key).tolist())
        return orig_forward(params, batch_stats, batch, key)

    predictor._forward = spy
    sg = {
        "objects": {
            str(i): {"name": f"obj{i % 2}", "attributes": [],
                     "relations": [], "x1": 0, "y1": 0, "x2": 9, "y2": 9}
            for i in range(6)
        }
    }
    # batch_size=1 -> every sample is its own batch with its own key
    results = predictor.predict(["what is next to the obj0?"] * 3,
                                [sg] * 3, batch_size=1)
    assert len(results) == 3
    assert len(seen_keys) == 3
    assert len({tuple(k) for k in seen_keys}) == 3, seen_keys
    # and the fold is deterministic across calls (same request -> same
    # answers)
    predictor.predict(["what is next to the obj0?"], [sg], batch_size=1)
    assert seen_keys[0] == seen_keys[3]


@pytest.fixture(scope="module")
def ckpt_bucketed(tmp_path_factory):
    """Checkpoint whose config carries two node buckets."""
    out = tmp_path_factory.mktemp("serve_ckpt_bucketed")
    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=16, meta_dir="",
        epochs=0, output_dir=str(out), max_nodes_per_graph=64,
        max_edges_per_graph=256, bucket_node_caps=(8, 64))
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)
    trainer.ckpt.save("checkpoint_top_res", trainer.state, epoch=0, cfg=cfg)
    return str(out / "checkpoint_top_res")


def test_predict_routes_small_graphs_to_small_buckets(ckpt_bucketed):
    """Serving reuses the bucket collators: a 2-node graph must run at
    the small node cap, not the full (max_nodes, max_edges) padding."""
    predictor = Predictor.from_checkpoint(ckpt_bucketed, meta_dir="")
    small_cap = min(predictor.cfg.bucket_node_caps)
    assert small_cap < predictor.cfg.max_nodes_per_graph
    sg = {"objects": {
        "0": {"name": "obj0", "attributes": [], "relations": [],
              "x1": 0, "y1": 0, "x2": 9, "y2": 9},
        "1": {"name": "obj1", "attributes": [], "relations": [],
              "x1": 1, "y1": 1, "x2": 5, "y2": 5},
    }}
    results = predictor.predict(["is there an obj1?"], [sg], batch_size=2)
    assert len(results) == 1 and results[0] is not None
    (node_shape, _), = predictor.last_batch_shapes
    assert node_shape[1] == small_cap


def test_predict_preserves_input_order_across_buckets(ckpt_bucketed):
    """Bucketed batching reorders execution; results must still map
    back to input positions."""
    predictor = Predictor.from_checkpoint(ckpt_bucketed, meta_dir="")

    def graph(n):
        return {"objects": {
            str(i): {"name": f"obj{i % 2}", "attributes": [],
                     "relations": [], "x1": 0, "y1": 0, "x2": 9, "y2": 9}
            for i in range(n)
        }}

    big = predictor.cfg.max_nodes_per_graph // 2 + 1   # big bucket
    graphs = [graph(2), graph(big), graph(3), graph(big), graph(2)]
    questions = [f"is there an obj{i % 2}?" for i in range(5)]
    results = predictor.predict(questions, graphs, batch_size=2)
    assert all(r is not None for r in results)
    for r, g in zip(results, graphs):
        assert len(r.node_mask) == len(g["objects"])
    assert len({shape for shape, _ in predictor.last_batch_shapes}) >= 2
