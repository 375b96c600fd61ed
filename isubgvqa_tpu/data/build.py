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
    collators: Dict[str, Collator]       # matching bucket specs
    vocab: SceneGraphVocab
    answers: AnswerMap
    tokenizer: object


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
        datasets = {
            "train": SyntheticGQA(vocab, answers, size=cfg.synthetic_size,
                                  seed=cfg.seed, split="train"),
            "dev": SyntheticGQA(vocab, answers,
                                size=max(cfg.synthetic_size // 4, 1),
                                seed=cfg.seed, split="valid"),
            "testdev": SyntheticGQA(vocab, answers,
                                    size=max(cfg.synthetic_size // 4, 1),
                                    seed=cfg.seed, split="testdev"),
        }
    else:
        store = SceneGraphStore(vocab, data_dir=cfg.data_dir,
                                max_nodes=cfg.max_nodes_per_graph)
        datasets = {
            "train": GQADataset("train", store, answers, cfg.data_dir),
            "dev": GQADataset("valid", store, answers, cfg.data_dir),
            "testdev": GQADataset("testdev", store, answers, cfg.data_dir),
        }

    def spec(bs: int) -> BucketSpec:
        return BucketSpec(
            batch_size=bs,
            max_nodes_per_graph=cfg.max_nodes_per_graph,
            max_edges_per_graph=cfg.max_edges_per_graph,
            question_len=cfg.question_len,
        )

    eval_bs = cfg.batch_size * cfg.eval_batch_factor   # build.py:55-67
    collators = {
        "train": Collator(tokenizer, spec(cfg.batch_size), vocab=vocab),
        "dev": Collator(tokenizer, spec(eval_bs), vocab=vocab),
        "testdev": Collator(tokenizer, spec(eval_bs), vocab=vocab),
    }
    return DataBundle(datasets=datasets, collators=collators, vocab=vocab,
                      answers=answers, tokenizer=tokenizer)
