#!/usr/bin/env python
"""Benchmark: batched GQA inference throughput (questions/sec/chip).

North star (BASELINE.json): >= 10,000 GQA questions/sec/chip on the
flagship ISubGVQA model — question transformer + scene-graph masked-GAT
forward with discrete subgraph extraction — at GQA-realistic shapes
(batch 256, ~17-node graphs, 1842 answers, real meta vocab when
mounted).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "questions/sec/chip",
     "vs_baseline": N/10000}
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_QPS = 10_000.0


def build_bench_setup(batch_size: int = 256, compute_dtype: str = "bfloat16",
                      num_batches: int = 4):
    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                                   HashWordTokenizer, SceneGraphVocab,
                                   SyntheticGQA)
    from isubgvqa_tpu.models.build import build_model, init_model

    cfg = Config(
        batch_size=batch_size,
        compute_dtype=compute_dtype,
        sampler_type="gumbel",
        sample_k=3,
        question_len=32,
        max_nodes_per_graph=64,
        max_edges_per_graph=192,
    )
    vocab = SceneGraphVocab.build(cfg.meta_dir, seed=cfg.seed)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=batch_size * num_batches, seed=0)
    spec = BucketSpec(
        batch_size=batch_size,
        max_nodes_per_graph=cfg.max_nodes_per_graph,
        max_edges_per_graph=cfg.max_edges_per_graph,
        question_len=cfg.question_len,
    )
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    coll = Collator(tok, spec, vocab=vocab)
    batches = [
        coll.collate([ds[i] for i in range(b * batch_size,
                                           (b + 1) * batch_size)])[0]
        for b in range(num_batches)
    ]
    import dataclasses

    cfg = dataclasses.replace(cfg, num_answers=len(answers))
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batches[0])
    return model, params, batch_stats, batches, cfg


def main():
    # NOTE on methodology: the dev-sandbox TPU tunnel deduplicates
    # repeated executions with identical inputs, so the benchmark
    # streams *distinct* batches (as real serving would) and only the
    # warmup batch repeats.
    batch_size = 512
    iters = 12
    model, params, batch_stats, batches, cfg = build_bench_setup(
        batch_size, num_batches=iters)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch_stats = jax.device_put(batch_stats, dev)
    batches = jax.device_put(batches, dev)

    @jax.jit
    def forward(params, batch, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False, rngs={"sampler": key})
        return out.logits, out.node_mask

    key = jax.random.PRNGKey(0)
    # compile + warmup
    jax.block_until_ready(forward(params, batches[0], key))

    t0 = time.perf_counter()
    outs = [forward(params, batches[i], key) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    qps = batch_size * iters / dt
    n_chips = max(len(jax.devices()), 1)
    result = {
        "metric": "GQA questions/sec/chip (batched inference, ISubGVQA "
                  "forward + discrete subgraph extraction)",
        "value": round(qps / n_chips, 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(qps / n_chips / BASELINE_QPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
