#!/usr/bin/env python
"""Synthesize a GQA-format dataset dump at realistic scale.

The sandbox has no network access to the 100GB GQA release, but the
parity harness (``scripts/parity_report.py``) must be exercised on
*real-format* data at the *true size distribution* (VERDICT r4 item 5)
— the exact JSON schemas the reference hard-requires on disk
(``/root/reference/ISubGVQA/datasets/gqa.py:129-153``,
``scene_graph.py:54-68``), with GQA-realistic statistics:

* scene-graph node counts ~ lognormal(2.6, 0.75) clipped to [1, 120]
  (real GQA: mean ~17, long tail past 100);
* object names / attributes / relations drawn from the REAL meta-info
  vocabularies (name_gqa.txt etc.), so vocab construction, GloVe
  alignment, OOV handling and the answer maps run against the true
  token inventories;
* answers drawn from the real trainval_label2ans.json (1842), biased
  toward object names present in the image so accuracy-AT and the
  co-occurrence metrics exercise;
* a share of null/missing scene graphs in testdev (the reference
  filters those, ``gqa.py:142-153``).

Usage::

    python tools/make_gqa_scale_dump.py --out /tmp/gqa_scale \
        --val_questions 50000 --val_images 8000
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

META_DEFAULT = os.environ.get("ISUBGVQA_META_DIR",
                              "/root/reference/ISubGVQA/meta_info")

_TEMPLATES = [
    "what is the {attr} {name} called",
    "is there a {name} in the image",
    "what color is the {name}",
    "what is next to the {name}",
    "how many {name} are there",
    "does the {name} look {attr}",
    "on which side of the image is the {name}",
    "is the {name} {attr} or {attr2}",
]
_LONG_TEMPLATES = [
    "looking very carefully at the whole scene shown in this image can "
    "you tell me whether the {name} that appears there seems {attr}",
    "considering everything that is visible in this particular picture "
    "what would you say is positioned directly next to the {name}",
]


def _load_meta(meta_dir):
    def lines(name):
        with open(os.path.join(meta_dir, name)) as f:
            return [ln.strip() for ln in f if ln.strip()]

    names = lines("name_gqa.txt")
    attrs = lines("attr_gqa.txt")
    rels = lines("rel_gqa.txt")
    with open(os.path.join(meta_dir, "trainval_label2ans.json")) as f:
        label2ans = json.load(f)
    return names, attrs, rels, label2ans


def _scene_graph(rng, names, attrs, rels, n_nodes):
    objects = {}
    for i in range(n_nodes):
        n_attr = int(rng.integers(0, 4))
        n_rel = int(rng.integers(0, min(3, n_nodes))) if n_nodes > 1 else 0
        targets = (rng.choice([j for j in range(n_nodes) if j != i],
                              size=min(n_rel, n_nodes - 1), replace=False)
                   if n_rel else [])
        x1, y1 = float(rng.uniform(0, 400)), float(rng.uniform(0, 300))
        objects[str(i)] = {
            "name": str(rng.choice(names)),
            "attributes": [str(a) for a in rng.choice(attrs, size=n_attr)],
            "relations": [{"object": str(int(t)),
                           "name": str(rng.choice(rels))} for t in targets],
            "x1": x1, "y1": y1,
            "x2": x1 + float(rng.uniform(10, 400)),
            "y2": y1 + float(rng.uniform(10, 300)),
        }
    return {"objects": objects}


def _questions(rng, imgs, graphs, ans_set, ans_list, n_questions, prefix):
    out = {}
    img_keys = list(imgs)
    for i in range(n_questions):
        img = img_keys[int(rng.integers(0, len(img_keys)))]
        sg = graphs[img]
        if sg is None or not sg["objects"]:
            obj = {"name": "thing", "attributes": []}
        else:
            objs = list(sg["objects"].values())
            obj = objs[int(rng.integers(0, len(objs)))]
        attr = obj["attributes"][0] if obj["attributes"] else "plain"
        attr2 = obj["attributes"][-1] if obj["attributes"] else "small"
        pool = _LONG_TEMPLATES if rng.random() < 0.2 else _TEMPLATES
        template = pool[int(rng.integers(0, len(pool)))]
        question = template.format(name=obj["name"], attr=attr,
                                   attr2=attr2) + "?"
        # answers biased to in-image object names (GQA's are grounded)
        r = rng.random()
        if r < 0.5 and obj["name"] in ans_set:
            answer = obj["name"]
        elif r < 0.75:
            answer = "yes" if rng.random() < 0.5 else "no"
        else:
            answer = ans_list[int(rng.integers(0, len(ans_list)))]
        out[f"{prefix}{i:08d}"] = {
            "imageId": img,
            "question": question,
            "answer": answer,
            "types": {"structural": "query", "semantic": "attr",
                      "detailed": "synthesizedAtScale"},
        }
    return out


def make_dump(out_dir, meta_dir=META_DEFAULT, seed=20260820,
              train_images=2000, train_questions=10000,
              val_images=8000, val_questions=50000,
              testdev_images=500, testdev_questions=2000):
    rng = np.random.default_rng(seed)
    names, attrs, rels, label2ans = _load_meta(meta_dir)
    ans_set = set(label2ans)

    os.makedirs(os.path.join(out_dir, "sceneGraphs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "questions"), exist_ok=True)

    def graphs_for(prefix, n_imgs, allow_null=False):
        out = {}
        for i in range(n_imgs):
            if allow_null and rng.random() < 0.05:     # gqa.py:142-153
                out[f"{prefix}{i:07d}"] = None
                continue
            n = int(np.clip(rng.lognormal(2.6, 0.75), 1, 120))
            out[f"{prefix}{i:07d}"] = _scene_graph(rng, names, attrs,
                                                   rels, n)
        return out

    train_sg = graphs_for("t", train_images)
    val_sg = graphs_for("v", val_images)
    td_sg = graphs_for("d", testdev_images, allow_null=True)

    for fname, data in [("train_sceneGraphs.json", train_sg),
                        ("val_sceneGraphs.json", val_sg),
                        ("scene_graphs_test_dev.json", td_sg)]:
        with open(os.path.join(out_dir, "sceneGraphs", fname), "w") as f:
            json.dump(data, f)

    for fname, imgs, n_q, prefix in [
        ("train_balanced_questions.json", train_sg, train_questions, "tq"),
        ("val_balanced_questions.json", val_sg, val_questions, "vq"),
        ("testdev_balanced_questions.json", td_sg, testdev_questions, "dq"),
    ]:
        qs = _questions(rng, imgs, {**train_sg, **val_sg, **td_sg},
                        ans_set, label2ans, n_q, prefix)
        with open(os.path.join(out_dir, "questions", fname), "w") as f:
            json.dump(qs, f)

    sizes = {k: len(v) for k, v in [("train_sg", train_sg),
                                    ("val_sg", val_sg), ("td_sg", td_sg)]}
    node_counts = [len(g["objects"]) for g in val_sg.values() if g]
    stats = {
        "out_dir": out_dir, "sizes": sizes,
        "questions": {"train": train_questions, "val": val_questions,
                      "testdev": testdev_questions},
        "val_nodes_mean": round(float(np.mean(node_counts)), 2),
        "val_nodes_p50": int(np.percentile(node_counts, 50)),
        "val_nodes_p99": int(np.percentile(node_counts, 99)),
        "val_nodes_max": int(np.max(node_counts)),
    }
    print(json.dumps(stats))
    return stats


def main():
    p = argparse.ArgumentParser("make_gqa_scale_dump")
    p.add_argument("--out", required=True)
    p.add_argument("--meta_dir", default=META_DEFAULT)
    p.add_argument("--seed", type=int, default=20260820)
    p.add_argument("--train_images", type=int, default=2000)
    p.add_argument("--train_questions", type=int, default=10000)
    p.add_argument("--val_images", type=int, default=8000)
    p.add_argument("--val_questions", type=int, default=50000)
    p.add_argument("--testdev_images", type=int, default=500)
    p.add_argument("--testdev_questions", type=int, default=2000)
    args = p.parse_args()
    make_dump(args.out, args.meta_dir, args.seed, args.train_images,
              args.train_questions, args.val_images, args.val_questions,
              args.testdev_images, args.testdev_questions)


if __name__ == "__main__":
    main()
