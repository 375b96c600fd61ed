"""Synthetic mini-GQA fixture.

The reference hard-requires the real GQA JSONs on disk
(``datasets/gqa.py:129-141``, ``scene_graph.py:54-62``) and has no test
fixtures at all.  This module generates a deterministic, structurally
faithful mini-dataset — scene graphs with names/attributes/relations
drawn from the real (or synthetic) scene-graph vocabulary, templated
questions whose answers reference graph content — so the full pipeline
(data -> model -> train -> explain) runs in CI and benchmarks without
the 100GB dataset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .gqa import AnswerMap, Sample
from .scene_graph import SceneGraphStore
from .vocab import SceneGraphVocab

_QUESTION_TEMPLATES = [
    "what is the {attr} object called",
    "is there a {name} in the image",
    "what color is the {name}",
    "what is next to the {name}",
    "how many {name} are there",
    "does the {name} look {attr}",
]


def _random_scene_graph(rng: np.random.Generator, names, attrs, rels,
                        min_nodes=3, max_nodes=24) -> dict:
    n = int(rng.integers(min_nodes, max_nodes + 1))
    objects = {}
    for i in range(n):
        n_attr = int(rng.integers(0, 4))
        n_rel = int(rng.integers(1, min(4, n)))
        targets = rng.choice([j for j in range(n) if j != i],
                             size=min(n_rel, n - 1), replace=False)
        objects[str(i)] = {
            "name": str(rng.choice(names)),
            "attributes": [str(a) for a in rng.choice(attrs, size=n_attr)],
            "relations": [
                {"object": str(int(t)), "name": str(rng.choice(rels))}
                for t in targets
            ],
            "x1": float(rng.uniform(0, 400)), "y1": float(rng.uniform(0, 300)),
            "x2": float(rng.uniform(400, 800)), "y2": float(rng.uniform(300, 600)),
        }
    return {"objects": objects}


class SyntheticGQA:
    """GQADataset-compatible synthetic split."""

    def __init__(self, vocab: SceneGraphVocab, answers: AnswerMap,
                 size: int = 2048, num_images: Optional[int] = None,
                 seed: int = 0, split: str = "train"):
        self.vocab = vocab
        self.answers = answers
        self.split = split
        rng = np.random.default_rng(seed + {"train": 0, "valid": 1,
                                            "testdev": 2}.get(split, 3))
        # pools from the vocab body (skip specials)
        body = [t for t in vocab.itos[5:] if not t.startswith("<")]
        third = max(len(body) // 3, 1)
        names = body[:third] or ["obj0"]
        attrs = body[third:2 * third] or ["attr0"]
        rels = body[2 * third:] or ["rel0"]

        n_imgs = num_images or max(size // 8, 1)
        graphs = {
            f"syn{split}{i}": _random_scene_graph(rng, names, attrs, rels)
            for i in range(n_imgs)
        }
        self.store = SceneGraphStore(vocab, graphs=graphs)

        ans_names = list(answers.ans2label.keys())
        self.samples = []
        for i in range(size):
            img = f"syn{split}{int(rng.integers(0, n_imgs))}"
            sg = graphs[img]
            objs = list(sg["objects"].values())
            obj = objs[int(rng.integers(0, len(objs)))]
            template = _QUESTION_TEMPLATES[int(rng.integers(0, len(_QUESTION_TEMPLATES)))]
            question = template.format(
                name=obj["name"],
                attr=(obj["attributes"][0] if obj["attributes"] else "plain"),
            ) + "?"
            # answer correlates with graph content when possible
            if obj["name"] in answers.ans2label:
                answer = obj["name"]
            else:
                answer = ans_names[int(rng.integers(0, len(ans_names)))]
            self.samples.append((f"q{split}{i}", img, question, answer))

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def num_answers(self) -> int:
        return len(self.answers)

    def __getitem__(self, idx: int) -> Sample:
        qid, img, question, answer = self.samples[idx]
        return Sample(
            question_id=qid,
            graph=self.store.query(img),
            question=question,
            qst_type={"structural": "query", "semantic": "attr",
                      "detailed": "synthetic"},
            label=self.answers.label_of(answer),
            image_id=img,
        )
