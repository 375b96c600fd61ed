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
