#!/usr/bin/env python
"""Benchmark: batched GQA inference throughput (questions/sec/chip).

North star (BASELINE.json): >= 10,000 GQA questions/sec/chip on the
flagship ISubGVQA model — question transformer + scene-graph masked-GAT
forward with discrete subgraph extraction — at GQA-realistic shapes
(batch 256+, ~17-node graphs, 1842 answers).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "questions/sec/chip",
     "vs_baseline": N/10000}

The default run measures the shipped configuration: size-bucketed
batches (the Trainer/explain-runner default — small graphs at the
(32, 128) node/edge caps, large at (128, 384), questions at 16- or
32-token tiers) streaming *distinct* inputs,
gumbel sampler with the reference's noisy eval forward.  Supplementary
numbers (step time, FLOPs/question, MFU vs the measured ~39 TFLOP/s
practical chip peak) go to stderr.  FLOPs come from XLA cost analysis,
which cannot see inside Pallas kernels — since lin_edge moved
in-kernel the reported FLOPs/question and MFU are lower bounds.

``python bench.py --full`` additionally benchmarks the three other
samplers (imle / aimle / simple) and the jitted *training* step for
each, writing a breakdown table to ``docs/bench_details.md`` — see
that file for the last recorded surface.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import numpy as np

BASELINE_QPS = 10_000.0
PRACTICAL_PEAK_TFLOPS = 39.0    # measured bf16 practical peak, CLAUDE.md


def _cfg(sampler: str, batch_size: int, dtype: str):
    from isubgvqa_tpu.config import Config

    return Config(
        batch_size=batch_size,
        compute_dtype=dtype,
        sampler_type=sampler,
        sample_k=3,
        question_len=32,
        max_nodes_per_graph=128,
        max_edges_per_graph=384,
        bucket_node_caps=(32, 128),
    )


def build_bench_setup(cfg, num_batches: int = 12):
    """Model + a stream of bucket-mixed distinct batches (the tunnel
    dedups identical executions, so every timed dispatch is unique)."""
    from isubgvqa_tpu.data import (AnswerMap, HashWordTokenizer,
                                   SceneGraphVocab, SyntheticGQA)
    from isubgvqa_tpu.data.batching import iterate_batches_bucketed
    from isubgvqa_tpu.data.build import build_bucket_collators
    from isubgvqa_tpu.models.build import (build_model, init_model,
                                           make_aimle_states)

    vocab = SceneGraphVocab.build(cfg.meta_dir, seed=cfg.seed)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=cfg.batch_size * num_batches,
                      seed=0)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    collators = build_bucket_collators(cfg, tok, vocab,
                                       batch_size=cfg.batch_size)
    batches = [b for b, _ in iterate_batches_bucketed(ds, collators,
                                                      drop_last=True)]
    cfg = dataclasses.replace(cfg, num_answers=len(answers))
    model = build_model(cfg, vocab)
    aimle_states = make_aimle_states(cfg)
    params, batch_stats = init_model(model, batches[0],
                                     aimle_states=aimle_states)
    return model, params, batch_stats, batches, cfg, aimle_states


def _flops_per_exec(fn, *args) -> float:
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_inference(sampler: str = "gumbel", batch_size: int = 512,
                    iters: int = 12, dtype: str = "bfloat16"):
    """-> dict with qps/chip, ms/batch, mfu estimate."""
    cfg = _cfg(sampler, batch_size, dtype)
    (model, params, batch_stats, batches, cfg,
     aimle_states) = build_bench_setup(cfg, iters)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch_stats = jax.device_put(batch_stats, dev)
    batches = jax.device_put(batches, dev)

    @jax.jit
    def forward(params, batch, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False, aimle_states=aimle_states,
                          rngs={"sampler": key})
        return out.logits, out.node_mask

    key = jax.random.PRNGKey(0)
    # Methodology (the tunnel makes this subtle):
    # * group by bucket shape and time each stream separately —
    #   serving keeps per-bucket queues, and switching the dispatched
    #   executable costs a tunnel sync that isn't the model's fault;
    # * every timed batch is distinct (identical re-executions are
    #   served from the tunnel's dedup cache) and the warmup batch is
    #   excluded;
    # * per-shape time is the MEDIAN over chunks of ~5 batches — the
    #   shared tunnel shows transient 2-3x congestion episodes that a
    #   single long window would average in;
    # * cost_analysis (a second compilation) runs only after timing.
    groups: dict = {}
    for b in batches:
        groups.setdefault((b.node_tokens.shape, b.qst_tokens.shape),
                          []).append(b)

    per_group: dict = {}
    for shape, group in sorted(groups.items()):
        if len(group) < 2:
            # a lone batch cannot be timed: its only execution is the
            # warmup, and re-dispatching identical inputs hits the
            # tunnel's dedup cache — drop the group from the surface
            continue
        jax.block_until_ready(forward(params, group[0], key))   # warmup
        timed = group[1:]
        chunk_ms = []
        for i in range(0, len(timed), 5):
            chunk = timed[i:i + 5]
            t0 = time.perf_counter()
            outs = [forward(params, b, key) for b in chunk]
            jax.block_until_ready(outs)
            chunk_ms.append((time.perf_counter() - t0) / len(chunk) * 1e3)
        per_group[shape] = (float(np.median(chunk_ms)), len(timed))

    flops = 0.0
    total_ms = 0.0
    n_small = n_timed = 0
    for shape, group in sorted(groups.items()):
        if shape not in per_group:
            continue
        ms, n = per_group[shape]
        total_ms += ms * n
        n_timed += n
        if shape[0][1] < cfg.max_nodes_per_graph:
            n_small += n
        flops += n * _flops_per_exec(
            lambda p, bb, k: forward(p, bb, k), params, group[0], key)

    n_q = batch_size * n_timed
    qps = n_q / (total_ms / 1e3)
    n_chips = max(len(jax.devices()), 1)
    return {
        "sampler": sampler,
        "qps_per_chip": qps / n_chips,
        "ms_per_batch": total_ms / n_timed,
        "batches": n_timed,
        "small_bucket_frac": n_small / max(n_timed, 1),
        "flops_per_question": flops / max(n_q, 1),
        "mfu": (flops / (total_ms / 1e3))
               / (PRACTICAL_PEAK_TFLOPS * 1e12 * n_chips),
    }


def bench_train_step(sampler: str, batch_size: int = 256, iters: int = 8,
                     dtype: str = "bfloat16"):
    """Jitted full training step (fwd + bwd + Adam) throughput."""
    from isubgvqa_tpu.train.schedule import make_optimizer
    from isubgvqa_tpu.train.state import create_train_state
    from isubgvqa_tpu.train.steps import make_train_step

    cfg = _cfg(sampler, batch_size, dtype)
    model, params, batch_stats, batches, cfg, _ = build_bench_setup(cfg, iters)
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=8)
    state = create_train_state(model, optimizer, batches[0], cfg)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batches = jax.device_put(batches, dev)

    step = jax.jit(make_train_step(model, optimizer, cfg))
    rng = jax.random.PRNGKey(0)
    groups: dict = {}
    for b in batches:
        groups.setdefault((b.node_tokens.shape, b.qst_tokens.shape),
                          []).append(b)

    total_dt = 0.0
    n_timed = 0
    for shape, group in sorted(groups.items()):
        if len(group) < 2:
            continue        # lone batch == warmup only (dedup cache)
        _, m = step(state, group[0], rng)         # compile + warmup
        jax.block_until_ready(m)
        timed = group[1:]
        n_timed += len(timed)
        t0 = time.perf_counter()
        for b in timed:                           # state update chains
            state, m = step(state, b, rng)
        jax.block_until_ready(m)
        total_dt += time.perf_counter() - t0
    n_chips = max(len(jax.devices()), 1)
    return {
        "sampler": sampler,
        "train_qps_per_chip": batch_size * n_timed / total_dt / n_chips,
        "ms_per_step": total_dt / n_timed * 1e3,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="bench all samplers + train steps; write "
                         "docs/bench_details.md")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=22)
    args = ap.parse_args()

    head = bench_inference("gumbel", args.batch_size, args.iters)
    result = {
        "metric": "GQA questions/sec/chip (batched inference, ISubGVQA "
                  "forward + discrete subgraph extraction, bucket-mixed "
                  "shapes)",
        "value": round(head["qps_per_chip"], 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(head["qps_per_chip"] / BASELINE_QPS, 3),
    }
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in head.items()}), file=sys.stderr)

    if args.full:
        rows = [head]
        train_rows = []
        for sampler in ("imle", "aimle", "simple"):
            rows.append(bench_inference(sampler, args.batch_size,
                                        args.iters))
            print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                              for k, v in rows[-1].items()}),
                  file=sys.stderr)
        for sampler in ("gumbel", "imle", "aimle", "simple"):
            train_rows.append(bench_train_step(sampler))
            print(json.dumps({k: round(v, 4) if isinstance(v, float)
                              else v for k, v in train_rows[-1].items()}),
                  file=sys.stderr)
        _write_details(rows, train_rows, args)

    print(json.dumps(result))


def _write_details(rows, train_rows, args):
    lines = [
        "# Benchmark surface (last `bench.py --full` run)",
        "",
        f"Batch {args.batch_size}, {args.iters} distinct bucket-mixed "
        "batches, bf16 compute, synthetic GQA-shaped graphs, one chip; "
        f"MFU against the measured ~{PRACTICAL_PEAK_TFLOPS:.0f} TFLOP/s "
        "practical peak.",
        "",
        "## Inference (eval forward + subgraph extraction)",
        "",
        "| sampler | questions/s/chip | ms/batch | MFU | kFLOPs/question |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['sampler']} | {r['qps_per_chip']:.0f} "
            f"| {r['ms_per_batch']:.1f} | {r['mfu']*100:.1f}% "
            f"| {r['flops_per_question']/1e3:.0f} |")
    lines += [
        "",
        "## Training step (forward + backward + Adam, batch 256)",
        "",
        "| sampler | questions/s/chip | ms/step |",
        "|---|---|---|",
    ]
    for r in train_rows:
        lines.append(f"| {r['sampler']} | {r['train_qps_per_chip']:.0f} "
                     f"| {r['ms_per_step']:.1f} |")
    lines.append("")
    import os

    os.makedirs("docs", exist_ok=True)
    with open("docs/bench_details.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
