"""Serving API: checkpoint -> answers + explanation subgraphs.

The reference has no serving surface (inference happens inside
``run_token_coo.py``'s evaluation loop); production deployment needs
one.  :class:`Predictor` wraps a trained checkpoint behind a simple
``predict(questions, scene_graphs)`` call: tokenization and graph
conversion on the host, one jitted batched forward on the TPU, answers
decoded with per-node explanation masks.

    predictor = Predictor.from_checkpoint("outputdir/checkpoint_top_res")
    results = predictor.predict(
        ["what is on the table?"],
        [ {"objects": {...GQA scene-graph dict...}} ],
    )
    results[0].answer, results[0].subgraph_nodes
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from .config import Config
from .data.batching import BucketSpec, Collator, iterate_batches_bucketed
from .data.build import build_bucket_collators
from .data.gqa import AnswerMap, Sample
from .data.scene_graph import convert_scene_graph
from .data.tokenizer import build_tokenizer
from .data.vocab import SceneGraphVocab
from .models.build import build_model, init_model, make_aimle_states


@dataclasses.dataclass
class Prediction:
    answer: str
    confidence: float
    top_answers: List[tuple]          # [(answer, prob), ...]
    subgraph_nodes: List[str]         # object labels the model kept
    node_mask: np.ndarray             # per-real-node 0/1 mask
    gate: np.ndarray                  # pooling attention per node


class Predictor:
    def __init__(self, cfg: Config, params, batch_stats,
                 vocab: SceneGraphVocab, answers: AnswerMap,
                 aimle_states=None, topk: int = 5):
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.vocab = vocab
        self.answers = answers
        self.topk = topk
        self.model = build_model(cfg, vocab)
        dev = jax.devices()[0]
        self.params = jax.device_put(params, dev)
        self.batch_stats = jax.device_put(batch_stats, dev)
        self.aimle_states = (jax.device_put(aimle_states, dev)
                             if aimle_states else None)
        self.tokenizer = build_tokenizer(cfg.clip_tokenizer_dir,
                                         max_len=cfg.question_len,
                                         vocab_size=cfg.text_vocab_size)
        self.last_batch_shapes: List[tuple] = []

        model = self.model

        @jax.jit
        def _forward(params, batch_stats, batch, key):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              batch, train=False,
                              aimle_states=self.aimle_states,
                              rngs={"sampler": key})
            return out.logits, out.node_mask, out.gate

        self._forward = _forward

    # ------------------------------------------------------------ build

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, meta_dir: Optional[str] = None,
                        **kw) -> "Predictor":
        meta_path = ckpt_path + ".meta.json"
        assert os.path.isfile(meta_path), f"missing {meta_path}"
        with open(meta_path) as f:
            meta = json.load(f)
        cfg = Config.from_json(json.dumps(meta["config"]))
        if meta_dir is not None:
            cfg = dataclasses.replace(cfg, meta_dir=meta_dir)

        vocab = SceneGraphVocab.build(cfg.meta_dir, glove_path=cfg.glove_path,
                                      seed=cfg.seed)
        answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
        cfg = dataclasses.replace(cfg, num_answers=len(answers))

        import orbax.checkpoint as ocp

        # restore against an abstract target built from a fresh init
        model = build_model(cfg, vocab)
        spec = BucketSpec(batch_size=1,
                          max_nodes_per_graph=cfg.max_nodes_per_graph,
                          max_edges_per_graph=cfg.max_edges_per_graph,
                          question_len=cfg.question_len)
        tok = build_tokenizer(cfg.clip_tokenizer_dir, max_len=cfg.question_len,
                              vocab_size=cfg.text_vocab_size)
        coll = Collator(tok, spec, vocab=vocab)
        dummy = Sample("q0", convert_scene_graph({"objects": {}}, vocab),
                       "hello?", {}, 0, "img0")
        batch, _ = coll.collate([dummy])
        aimle_states = make_aimle_states(cfg)

        ckpter = ocp.StandardCheckpointer()
        path = os.path.abspath(ckpt_path)
        try:
            # training checkpoints hold a full TrainState
            from .train.schedule import make_optimizer
            from .train.state import create_train_state

            state = create_train_state(model, make_optimizer(cfg.lr, 1),
                                       batch, cfg)
            restored = ckpter.restore(path, target=jax.device_get(state))
            params, batch_stats = restored.params, restored.batch_stats
            aimle_states = restored.aimle_states
        except BaseException:
            # converted checkpoints carry only {params, batch_stats}
            params, batch_stats = init_model(model, batch,
                                             aimle_states=aimle_states)
            restored = ckpter.restore(
                path, target=jax.device_get(
                    {"params": params, "batch_stats": batch_stats}))
            params, batch_stats = restored["params"], restored["batch_stats"]
        return cls(cfg, params, batch_stats, vocab, answers,
                   aimle_states=aimle_states, **kw)

    # ---------------------------------------------------------- predict

    def _collators(self, batch_size: int) -> Dict[tuple, Collator]:
        """Size-bucketed collators (one jit specialization per bucket)
        so small graphs / short questions don't pay the largest caps'
        padding — the Trainer/explain-runner economics applied to
        serving (``data/build.py:build_bucket_collators``).

        Fresh per request: unlike training datasets (whose graphs are
        cached per image, bounding the native PackedGraphStore), every
        ``predict`` call converts new scene graphs — a store shared
        across requests would grow without bound in a long-running
        server, so the store (and its collators) is scoped to the
        request."""
        from .native.collate import PackedGraphStore, load_collate_lib

        store = PackedGraphStore() if load_collate_lib() is not None else None
        return build_bucket_collators(self.cfg, self.tokenizer, self.vocab,
                                      batch_size=batch_size,
                                      packed_store=store)

    def predict(self, questions: Sequence[str],
                scene_graphs: Sequence[dict],
                batch_size: int = 64,
                seed: int = 0) -> List[Prediction]:
        """Answer ``questions[i]`` against ``scene_graphs[i]`` (GQA
        scene-graph dicts).  Batches are size-bucketed; partial
        batches are padded.  The PRNG key is folded per batch so
        noisy-eval samplers (gumbel/aimle/simple — reference-faithful
        behavior) draw fresh noise for every batch of a large request,
        as the Trainer's validation loop does (``train/loop.py``)."""
        assert len(questions) == len(scene_graphs)
        samples = [
            Sample(f"q{i}", convert_scene_graph(sg, self.vocab,
                                                self.cfg.max_nodes_per_graph),
                   q, {}, 0, f"img{i}")
            for i, (q, sg) in enumerate(zip(questions, scene_graphs))
        ]
        key = jax.random.PRNGKey(seed)
        results: List[Optional[Prediction]] = [None] * len(samples)
        self.last_batch_shapes = []       # introspection / tests
        for b_idx, (batch, meta) in enumerate(iterate_batches_bucketed(
                samples, self._collators(batch_size))):
            batch_rng = jax.random.fold_in(key, b_idx)
            self.last_batch_shapes.append(
                (batch.node_tokens.shape, batch.qst_tokens.shape))
            logits, node_mask, gate = jax.device_get(
                self._forward(self.params, self.batch_stats, batch,
                              batch_rng))
            probs = _softmax(logits)
            nm = (node_mask[..., 0] if node_mask is not None
                  else np.ones(batch.node_tokens.shape[:2]))
            for s in range(meta.num_real):
                valid = np.asarray(batch.node_mask)[s]
                labels = [self.vocab.itos[t] for t in
                          np.asarray(batch.node_tokens)[s][valid, 0]]
                mask_s = nm[s][valid]
                order = np.argsort(-probs[s])[: self.topk]
                results[int(meta.question_ids[s][1:])] = Prediction(
                    answer=self.answers.label2ans[int(order[0])],
                    confidence=float(probs[s][order[0]]),
                    top_answers=[(self.answers.label2ans[int(j)],
                                  float(probs[s][j])) for j in order],
                    subgraph_nodes=[l for l, m in zip(labels, mask_s)
                                    if m > 0],
                    node_mask=mask_s,
                    gate=np.asarray(gate)[s][valid, 0],
                )
        return results


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)
