"""Dataset/collator construction for the three GQA splits.

Equivalent of ``build_datasets`` (``datasets/build.py:7-97``):
train/dev/testdev datasets sharing one scene-graph store, per-process
sharded iteration (DistributedSampler parity), and the reference's
validation/testdev batch-size ×4 (``build.py:55-67``).  Falls back to
the synthetic mini-GQA fixture when the real JSONs are absent or
``cfg.synthetic`` is set.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

from ..config import Config
from .batching import BucketSpec, Collator
from .gqa import AnswerMap, GQADataset
from .scene_graph import SceneGraphStore
from .synthetic import SyntheticGQA
from .tokenizer import build_tokenizer
from .vocab import SceneGraphVocab


@dataclasses.dataclass
class DataBundle:
    datasets: Dict[str, object]          # train / dev / testdev
    collators: Dict[str, Collator]       # per split, at the largest caps
    vocab: SceneGraphVocab
    answers: AnswerMap
    tokenizer: object
    # per split: node-cap -> Collator (ascending caps; one jit
    # specialization per cap).  ``{cap_max: collators[split]}`` when
    # bucketing is disabled.
    bucket_collators: Dict[str, Dict[int, Collator]] = dataclasses.field(
        default_factory=dict)


def _has_real_gqa(cfg: Config) -> bool:
    return os.path.isfile(os.path.join(
        cfg.data_dir, "questions", "train_balanced_questions.json"))


def build_datasets(cfg: Config) -> DataBundle:
    vocab = SceneGraphVocab.build(cfg.meta_dir, glove_path=cfg.glove_path,
                                  seed=cfg.seed)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    tokenizer = build_tokenizer(cfg.clip_tokenizer_dir,
                                max_len=cfg.question_len,
                                vocab_size=cfg.text_vocab_size)

    if cfg.synthetic or not _has_real_gqa(cfg):
        mix = cfg.synthetic_shape_mix
        datasets = {
            "train": SyntheticGQA(vocab, answers, size=cfg.synthetic_size,
                                  seed=cfg.seed, split="train",
                                  shape_mix=mix),
            "dev": SyntheticGQA(vocab, answers,
                                size=max(cfg.synthetic_size // 4, 1),
                                seed=cfg.seed, split="valid",
                                shape_mix=mix),
            "testdev": SyntheticGQA(vocab, answers,
                                    size=max(cfg.synthetic_size // 4, 1),
                                    seed=cfg.seed, split="testdev",
                                    shape_mix=mix),
        }
    else:
        store = SceneGraphStore(vocab, data_dir=cfg.data_dir,
                                max_nodes=cfg.max_nodes_per_graph)
        datasets = {
            "train": GQADataset("train", store, answers, cfg.data_dir),
            "dev": GQADataset("valid", store, answers, cfg.data_dir),
            "testdev": GQADataset("testdev", store, answers, cfg.data_dir),
        }

    eval_bs = cfg.batch_size * cfg.eval_batch_factor   # build.py:55-67
    split_bs = {"train": cfg.batch_size, "dev": eval_bs, "testdev": eval_bs}
    # one packed store shared by every split/bucket collator: the
    # splits share the scene-graph store, so graphs pack once
    packed = _make_packed_store()
    bucket_collators = {
        split: build_bucket_collators(cfg, tokenizer, vocab, batch_size=bs,
                                      packed_store=packed)
        for split, bs in split_bs.items()
    }
    n_max, q_max = cfg.max_nodes_per_graph, cfg.question_len
    collators = {split: colls[(n_max, q_max)]
                 for split, colls in bucket_collators.items()}
    return DataBundle(datasets=datasets, collators=collators, vocab=vocab,
                      answers=answers, tokenizer=tokenizer,
                      bucket_collators=bucket_collators)


def _make_packed_store():
    """A PackedGraphStore when the native collate kernel is available,
    else None (collators then run the pure-Python fill)."""
    from ..native.collate import PackedGraphStore, load_collate_lib
    return PackedGraphStore() if load_collate_lib() is not None else None


def build_bucket_collators(cfg: Config, tokenizer, vocab,
                           batch_size: int,
                           packed_store=None) -> Dict[tuple, Collator]:
    """Collators keyed by ``(node_cap, question_len_cap)`` over the
    cross product of the configured node and question-length buckets.

    * node caps ascend and clamp to the configured maximum; each small
      bucket gets a 4x-nodes edge budget (measured free on TPU at
      these shapes, and it keeps edge-heavy small graphs out of the
      expensive large bucket);
    * question-length caps clamp to ``cfg.question_len`` — GQA
      questions are mostly <= 16 CLIP tokens, and the question
      transformer is over half the forward's FLOPs.
    """
    n_max, e_max = cfg.max_nodes_per_graph, cfg.max_edges_per_graph
    q_max = cfg.question_len
    n_caps = sorted({min(c, n_max) for c in (cfg.bucket_node_caps or ())}
                    | {n_max})
    q_caps = sorted({min(q, q_max) for q in (cfg.bucket_question_lens or ())}
                    | {q_max})

    def e_cap_for(n_cap: int) -> int:
        return e_max if n_cap == n_max else min(max(4 * n_cap, 1), e_max)

    if packed_store is None:
        packed_store = _make_packed_store()
    return {
        (n_cap, q_cap): Collator(
            tokenizer,
            BucketSpec(batch_size=batch_size, max_nodes_per_graph=n_cap,
                       max_edges_per_graph=e_cap_for(n_cap),
                       question_len=q_cap),
            vocab=vocab, packed_store=packed_store)
        for n_cap in n_caps for q_cap in q_caps
    }
