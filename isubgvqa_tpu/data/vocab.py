"""Scene-graph vocabulary and embedding initialization.

Host-side equivalent of ``GQASceneGraphs.build_scene_graph_encoding_vocab``
(``datasets/scene_graph.py:146-197``): the vocabulary is the
concatenation of six meta-info token lists plus ``<self>`` and
``pokemon`` sentinels, fronted by the five special tokens, with
GloVe-6B-300d vectors where available and seeded random init otherwise.

Reference quirks reproduced on purpose:

* the token list is deduplicated by a dict comprehension whose values
  are *last-occurrence indices* used as frequencies by torchtext's
  ``vocab()`` — so a token whose only occurrence is at position 0 has
  "frequency" 0 and is dropped (``scene_graph.py:166,172``);
* special tokens that also appear in the list (``<self>``) are kept
  only in the specials block.

When the meta-info directory is missing (CI), a small synthetic
vocabulary with the same structure is built instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

SPECIALS = ["<unk>", "<pad>", "<sos>", "<eos>", "<self>"]

_META_FILES_TXT = ["name_gqa.txt", "attr_gqa.txt", "rel_gqa.txt"]
_META_FILES_JSON = ["objects.json", "predicates.json", "attributes.json"]


def _load_str_list(path: str) -> list[str]:
    with open(path) as f:
        return f.read().splitlines()


class SceneGraphVocab:
    """Token <-> id mapping plus 300-d embedding initialization."""

    def __init__(self, itos: Sequence[str], dim: int = 300,
                 glove_path: Optional[str] = None, seed: int = 3407):
        self.itos = list(itos)
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.dim = dim
        self.unk_index = self.stoi["<unk>"]
        self.pad_index = self.stoi["<pad>"]
        self.self_index = self.stoi["<self>"]
        self._glove_path = glove_path
        self._seed = seed
        self._vectors: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.itos)

    def get(self, token: str, default: Optional[int] = None) -> int:
        if default is None:
            default = self.unk_index
        return self.stoi.get(token, default)

    @property
    def vectors(self) -> np.ndarray:
        """Embedding init: random normal overwritten by GloVe rows when a
        vector file is available (scene_graph.py:185-196)."""
        if self._vectors is None:
            rng = np.random.default_rng(self._seed)
            vecs = rng.standard_normal((len(self.itos), self.dim)).astype(np.float32)
            if self._glove_path and os.path.isfile(self._glove_path):
                wanted = self.stoi
                with open(self._glove_path, encoding="utf-8") as f:
                    for line in f:
                        parts = line.rstrip().split(" ")
                        idx = wanted.get(parts[0])
                        if idx is not None and len(parts) == self.dim + 1:
                            vecs[idx] = np.asarray(parts[1:], dtype=np.float32)
            # padding row is zero (nn.Embedding padding_idx semantics,
            # scene_graph_encoder.py:19-21)
            vecs[self.pad_index] = 0.0
            self._vectors = vecs
        return self._vectors

    @classmethod
    def from_meta_dir(cls, meta_dir: str, glove_path: Optional[str] = None,
                      seed: int = 3407) -> "SceneGraphVocab":
        tokens: list[str] = []
        for name in _META_FILES_TXT:
            tokens += _load_str_list(os.path.join(meta_dir, name))
        for name in _META_FILES_JSON:
            with open(os.path.join(meta_dir, name)) as f:
                tokens += json.load(f)
        tokens.append("<self>")
        tokens.append("pokemon")  # reference sentinel (scene_graph.py:163)

        # torchtext vocab() reproduction — see module docstring.
        last_index = {tok: i for i, tok in enumerate(tokens)}
        order = list(dict.fromkeys(tokens))
        body = [t for t in order if last_index[t] >= 1 and t not in SPECIALS]
        return cls(SPECIALS + body, glove_path=glove_path, seed=seed)

    @classmethod
    def synthetic(cls, num_objects: int = 30, num_attrs: int = 20,
                  num_rels: int = 10, seed: int = 3407) -> "SceneGraphVocab":
        """Tiny structured vocab for tests / fixtures (no meta assets)."""
        body = (
            [f"obj{i}" for i in range(num_objects)]
            + [f"attr{i}" for i in range(num_attrs)]
            + [f"rel{i}" for i in range(num_rels)]
            + ["pokemon"]
        )
        return cls(SPECIALS + body, seed=seed)

    @classmethod
    def build(cls, meta_dir: Optional[str], glove_path: Optional[str] = None,
              seed: int = 3407) -> "SceneGraphVocab":
        if meta_dir and os.path.isdir(meta_dir) and os.path.isfile(
            os.path.join(meta_dir, "name_gqa.txt")
        ):
            return cls.from_meta_dir(meta_dir, glove_path=glove_path, seed=seed)
        return cls.synthetic(seed=seed)
