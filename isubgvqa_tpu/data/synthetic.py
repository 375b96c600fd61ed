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

# long variants (>16 word tokens) so the question-length buckets and
# the 32-token transformer tier actually exercise in benchmarks
_LONG_QUESTION_TEMPLATES = [
    "looking very carefully at the whole scene shown in this image can "
    "you tell me whether the {name} that appears there seems {attr}",
    "considering everything that is visible in this particular picture "
    "what would you say is positioned directly next to the {name}",
    "out of all of the different objects that can be seen in the image "
    "how many of them would you describe as being a {name}",
]


def _random_scene_graph(rng: np.random.Generator, names, attrs, rels,
                        min_nodes=3, max_nodes=24,
                        n_nodes=None, max_rel=3) -> dict:
    n = n_nodes if n_nodes is not None \
        else int(rng.integers(min_nodes, max_nodes + 1))
    objects = {}
    for i in range(n):
        n_attr = int(rng.integers(0, 4))
        n_rel = int(rng.integers(1, min(max_rel + 1, n)))
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
    """GQADataset-compatible synthetic split.

    ``shape_mix`` controls the size distribution:

    * ``"small"`` (default) — 3-24-node graphs, short questions; the
      fast CI fixture.
    * ``"gqa"`` — GQA-realistic heavy tail (SURVEY §5: real GQA scene
      graphs span ~1-100 nodes, mean ~17; questions 7-20 CLIP tokens
      with a long tail): node counts ~ lognormal(2.6, 0.75) clipped to
      [2, 120], sparser relations so edge counts track real GQA's
      ~2.7 edges/node, and ~30% long questions (>16 word tokens).
      Benchmarks use this so every size bucket exercises
      (``bench.py``).
    """

    def __init__(self, vocab: SceneGraphVocab, answers: AnswerMap,
                 size: int = 2048, num_images: Optional[int] = None,
                 seed: int = 0, split: str = "train",
                 shape_mix: str = "small"):
        self.vocab = vocab
        self.answers = answers
        self.split = split
        self.shape_mix = shape_mix
        rng = np.random.default_rng(seed + {"train": 0, "valid": 1,
                                            "testdev": 2}.get(split, 3))
        # pools from the vocab body (skip specials)
        body = [t for t in vocab.itos[5:] if not t.startswith("<")]
        third = max(len(body) // 3, 1)
        names = body[:third] or ["obj0"]
        attrs = body[third:2 * third] or ["attr0"]
        rels = body[2 * third:] or ["rel0"]

        n_imgs = num_images or max(size // 8, 1)
        if shape_mix == "gqa":
            graphs = {}
            for i in range(n_imgs):
                n = int(np.clip(rng.lognormal(2.6, 0.75), 2, 120))
                graphs[f"syn{split}{i}"] = _random_scene_graph(
                    rng, names, attrs, rels, n_nodes=n, max_rel=2)
        else:
            graphs = {
                f"syn{split}{i}": _random_scene_graph(rng, names, attrs,
                                                      rels)
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
            long_q = shape_mix == "gqa" and rng.random() < 0.3
            pool = _LONG_QUESTION_TEMPLATES if long_q else _QUESTION_TEMPLATES
            template = pool[int(rng.integers(0, len(pool)))]
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
