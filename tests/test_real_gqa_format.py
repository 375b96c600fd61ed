"""Real-GQA file-format path: write GQA-schema JSON fixtures to disk
and drive SceneGraphStore + GQADataset + build_datasets through them
(the exact code path used when the real dataset is mounted)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data.build import build_datasets
from isubgvqa_tpu.data.gqa import GQADataset
from isubgvqa_tpu.data.scene_graph import SceneGraphStore
from isubgvqa_tpu.data.vocab import SceneGraphVocab


def write_gqa_fixture(root):
    """Minimal on-disk dataset in the GQA layout/schema."""
    os.makedirs(os.path.join(root, "sceneGraphs"), exist_ok=True)
    os.makedirs(os.path.join(root, "questions"), exist_ok=True)

    def sg(names):
        objects = {}
        for i, name in enumerate(names):
            objects[str(i)] = {
                "name": name,
                "attributes": ["attr0"],
                "relations": ([{"object": str((i + 1) % len(names)),
                                "name": "rel0"}] if len(names) > 1 else []),
                "x1": 1, "y1": 2, "x2": 30, "y2": 40,
            }
        return {"objects": objects}

    train_sg = {"img1": sg(["obj0", "obj1", "obj2"]), "img2": sg(["obj3"])}
    val_sg = {"img3": sg(["obj4", "obj5"])}
    td_sg = {"img4": sg(["obj6", "obj7"]), "img5": None}

    for fname, data in [("train_sceneGraphs.json", train_sg),
                        ("val_sceneGraphs.json", val_sg),
                        ("scene_graphs_test_dev.json", td_sg)]:
        with open(os.path.join(root, "sceneGraphs", fname), "w") as f:
            json.dump(data, f)

    def q(img, question, answer):
        return {"imageId": img, "question": question, "answer": answer,
                "types": {"structural": "query", "semantic": "attr",
                          "detailed": "t"}}

    questions = {
        "train_balanced_questions.json": {
            "q1": q("img1", "what is it?", "yes"),
            "q2": q("img2", "is there an obj3?", "no"),
            "q3": q("imgX", "unknown image?", "bottle cap"),
        },
        "val_balanced_questions.json": {
            "q4": q("img3", "what is next to the obj4?", "obj5"),
        },
        "testdev_balanced_questions.json": {
            "q5": q("img4", "is this a test?", "yes"),
            "q6": q("img5", "null scene graph?", "no"),     # filtered out
            "q7": q("img9", "missing image?", "no"),        # filtered out
        },
    }
    for fname, data in questions.items():
        with open(os.path.join(root, "questions", fname), "w") as f:
            json.dump(data, f)


@pytest.fixture()
def gqa_dir(tmp_path):
    write_gqa_fixture(str(tmp_path))
    return str(tmp_path)


def test_scene_graph_store_from_files(gqa_dir):
    vocab = SceneGraphVocab.synthetic()
    store = SceneGraphStore(vocab, data_dir=gqa_dir)
    g = store.query("img1")
    assert g.num_nodes == 3
    # bbox read through
    np.testing.assert_allclose(g.node_bbox[0], [1, 2, 30, 40])
    # unknown image id -> 6-node fallback (scene_graph.py:74-144)
    assert store.query("imgX").num_nodes == 6
    # single-node graph (only a self-loop) -> fallback too
    assert store.query("img2").num_nodes == 6


def test_gqa_dataset_splits_and_filters(gqa_dir):
    vocab = SceneGraphVocab.synthetic()
    from isubgvqa_tpu.data.gqa import AnswerMap

    answers = AnswerMap.synthetic(16)
    store = SceneGraphStore(vocab, data_dir=gqa_dir)
    train = GQADataset("train", store, answers, gqa_dir)
    assert len(train) == 3
    s = train[2]
    # bottle cap -> bottle remap (gqa.py:179-181)
    assert s.label == answers.ans2label["bottle"]

    testdev = GQADataset("testdev", store, answers, gqa_dir)
    # null scene graph and missing image filtered (gqa.py:142-153)
    assert len(testdev) == 1
    assert testdev[0].question_id == "q5"


def test_build_datasets_real_path(gqa_dir):
    cfg = Config(data_dir=gqa_dir, meta_dir="", num_answers=16,
                 batch_size=2, synthetic=False, question_len=12,
                 max_nodes_per_graph=16, max_edges_per_graph=64)
    bundle = build_datasets(cfg)
    assert len(bundle.datasets["train"]) == 3
    from isubgvqa_tpu.data.batching import iterate_batches

    batch, meta = next(iterate_batches(bundle.datasets["train"],
                                       bundle.collators["train"]))
    assert batch.qst_tokens.shape == (2, 12)
    assert meta.num_real == 2
