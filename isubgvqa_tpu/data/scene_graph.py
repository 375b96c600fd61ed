"""GQA scene-graph loading and graph -> array conversion (host side).

Equivalent of ``GQASceneGraphs`` (``datasets/scene_graph.py:10-389``),
emitting plain numpy arrays instead of ``torch_geometric.data.Data``.

Reference semantics reproduced exactly:

* node features = 1 name token + up to 3 attribute tokens, padded to 4
  with ``<pad>`` (``scene_graph.py:276-297``);
* bbox = (x1, y1, x2, y2) or −1 when absent (``:299-307``);
* one self-loop edge per node carrying the ``<self>`` token, inserted
  before that node's relation edges (``:309-313``);
* missing reverse edges are appended and *recorded*
  (``added_sym_edge``, ``:329-343``) — downstream their embeddings are
  negated (``scene_graph_encoder.py:80``), which we encode as a
  per-edge sign array;
* the hard-coded 6-node ``<unk>`` fallback graph for unknown image ids
  and the "single-edge graph -> fallback" rule
  (``scene_graph.py:74-144``) and the 2-node dummy for empty graphs
  (``:201-228``).

Deviation (documented): the reference iterates ``set(attributes)``
(``:292``), whose order is nondeterministic across Python processes;
we deduplicate preserving first occurrence for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np

from .vocab import SceneGraphVocab

MAX_OBJ_TOKEN_LEN = 4  # 1 name + 3 attributes (scene_graph.py:276)


@dataclasses.dataclass
class GraphArrays:
    """One scene graph as fixed-dtype numpy arrays (COO edges)."""

    node_tokens: np.ndarray   # int32 [N, 4]
    node_bbox: np.ndarray     # float32 [N, 4]
    edge_src: np.ndarray      # int32 [E]
    edge_dst: np.ndarray      # int32 [E]
    edge_token: np.ndarray    # int32 [E]
    edge_sign: np.ndarray     # float32 [E]; -1 on added symmetric edges

    @property
    def num_nodes(self) -> int:
        return self.node_tokens.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]


def _dummy_sg(num_pairs: int = 3) -> dict:
    """The reference's hard-coded <unk> fallback scene graph
    (scene_graph.py:75-138 uses 6 nodes; :205-228 uses 2)."""
    chain = {0: 1, 1: 0, 2: 3, 3: 1, 4: 5, 5: 3}
    objects = {}
    for i in range(num_pairs * 2):
        objects[str(i)] = {
            "name": "<unk>",
            "relations": [{"object": str(chain.get(i, 0)), "name": "<unk>"}],
            "attributes": ["<unk>"],
        }
    return {"objects": objects}


EMPTY_SG_6 = _dummy_sg(3)
EMPTY_SG_2 = {
    "objects": {
        "0": {"name": "<unk>", "relations": [{"object": "1", "name": "<unk>"}],
              "attributes": ["<unk>"]},
        "1": {"name": "<unk>", "relations": [{"object": "0", "name": "<unk>"}],
              "attributes": ["<unk>"]},
    }
}


def convert_scene_graph(sg: dict, vocab: SceneGraphVocab,
                        max_nodes: Optional[int] = None) -> GraphArrays:
    """GQA scene-graph dict -> :class:`GraphArrays`
    (scene_graph.py:199-389)."""
    if len(sg.get("objects", {})) == 0:
        sg = EMPTY_SG_2  # scene_graph.py:201-228

    obj_ids = sorted(sg["objects"].keys())
    if max_nodes is not None and len(obj_ids) > max_nodes:
        obj_ids = obj_ids[:max_nodes]
    id_to_idx = {oid: i for i, oid in enumerate(obj_ids)}

    pad = vocab.pad_index
    self_tok = vocab.self_index
    # reference OOV default is index 1 == <pad>, not <unk>
    # (scene_graph.py:285,296,324: ``stoi.get(token, 1)``)
    oov = 1

    # edges present in the raw graph, for symmetrization bookkeeping
    present = set()
    for oid in obj_ids:
        i = id_to_idx[oid]
        for rel in sg["objects"][oid]["relations"]:
            j = id_to_idx.get(rel["object"])
            if j is not None:
                present.add((i, j))

    node_tokens, bboxes = [], []
    src, dst, etok, esign = [], [], [], []

    for oid in obj_ids:
        i = id_to_idx[oid]
        obj = sg["objects"][oid]

        tok = np.full(MAX_OBJ_TOKEN_LEN, pad, dtype=np.int32)
        tok[0] = vocab.stoi.get(obj["name"], oov)
        # dedup attributes, keep ≤3 (scene_graph.py:291-297)
        for a_idx, attr in enumerate(dict.fromkeys(obj.get("attributes", []))):
            if a_idx >= 3:
                break
            tok[a_idx + 1] = vocab.stoi.get(attr, oov)
        node_tokens.append(tok)

        bboxes.append([obj.get("x1", -1), obj.get("y1", -1),
                       obj.get("x2", -1), obj.get("y2", -1)])

        # self loop first (scene_graph.py:309-313)
        src.append(i); dst.append(i); etok.append(self_tok); esign.append(1.0)

        for rel in obj["relations"]:
            j = id_to_idx.get(rel["object"])
            if j is None:
                continue
            rel_tok = vocab.stoi.get(rel["name"], oov)
            src.append(i); dst.append(j); etok.append(rel_tok); esign.append(1.0)
            # append missing reverse edge, flagged (scene_graph.py:329-343)
            if (j, i) not in present:
                src.append(j); dst.append(i); etok.append(rel_tok)
                esign.append(-1.0)

    return GraphArrays(
        node_tokens=np.stack(node_tokens).astype(np.int32),
        node_bbox=np.asarray(bboxes, dtype=np.float32),
        edge_src=np.asarray(src, dtype=np.int32),
        edge_dst=np.asarray(dst, dtype=np.int32),
        edge_token=np.asarray(etok, dtype=np.int32),
        edge_sign=np.asarray(esign, dtype=np.float32),
    )


class SceneGraphStore:
    """All splits' scene graphs + per-image conversion cache
    (scene_graph.py:49-72, gqa.py:159,170-177)."""

    def __init__(self, vocab: SceneGraphVocab, data_dir: Optional[str] = None,
                 graphs: Optional[Dict[str, dict]] = None,
                 max_nodes: Optional[int] = None):
        self.vocab = vocab
        self.max_nodes = max_nodes
        self._cache: Dict[str, GraphArrays] = {}
        if graphs is not None:
            self.scene_graphs = dict(graphs)
            self.scene_graphs_testdev: Dict[str, dict] = {}
        else:
            root = os.path.join(data_dir or ".", "sceneGraphs")
            self.scene_graphs = {}
            self.scene_graphs_testdev = {}
            for fname, is_testdev in [
                ("train_sceneGraphs.json", False),
                ("val_sceneGraphs.json", False),
                ("scene_graphs_test_dev.json", True),
            ]:
                path = os.path.join(root, fname)
                if os.path.isfile(path):
                    with open(path) as f:
                        part = json.load(f)
                    self.scene_graphs.update(part)
                    if is_testdev:
                        self.scene_graphs_testdev = part

    def query(self, image_id: str) -> GraphArrays:
        """query_and_translate (scene_graph.py:74-144): unknown ids get
        the 6-node fallback; a single-edge result also falls back."""
        cached = self._cache.get(image_id)
        if cached is not None:
            return cached
        sg = self.scene_graphs.get(image_id, EMPTY_SG_6)
        arrays = convert_scene_graph(sg, self.vocab, self.max_nodes)
        if arrays.num_edges == 1:
            arrays = convert_scene_graph(EMPTY_SG_6, self.vocab, self.max_nodes)
        self._cache[image_id] = arrays
        return arrays
