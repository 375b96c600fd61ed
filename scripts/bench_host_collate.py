#!/usr/bin/env python
"""Host-side collation micro-benchmark: native C++ fill vs pure Python.

Backs the numbers quoted in README.md ("Native host collation"):
samples/sec of dense-batch assembly at the benchmark batch size, per
bucket, on the GQA-realistic synthetic mix.  Runs entirely on CPU (no
TPU client is created).

    python scripts/bench_host_collate.py [--batch-size 2048]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data import (AnswerMap, HashWordTokenizer,
                                   SceneGraphVocab, SyntheticGQA)
    from isubgvqa_tpu.data.batching import Collator, route_to_buckets
    from isubgvqa_tpu.data.build import build_bucket_collators
    from isubgvqa_tpu.native import PackedGraphStore, load_collate_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    cfg = Config(batch_size=args.batch_size, question_len=32,
                 bucket_node_caps=(16, 32, 64, 128),
                 bucket_question_lens=(16, 32))
    vocab = SceneGraphVocab.build(cfg.meta_dir, seed=cfg.seed)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=args.batch_size * 4, seed=0,
                      shape_mix="gqa")
    tok = HashWordTokenizer(max_len=cfg.question_len)
    colls = build_bucket_collators(cfg, tok, vocab,
                                   batch_size=args.batch_size)
    assert load_collate_lib() is not None, "native kernel unavailable"
    per = route_to_buckets(ds, colls)

    out = {"batch_size": args.batch_size, "buckets": {}}
    for key, members in per.items():
        if len(members) < 8:
            continue
        idx = (members * ((args.batch_size // len(members)) + 1))
        idx = idx[:args.batch_size]
        samples = [ds[j] for j in idx]
        nat = colls[key]
        py = Collator(nat.tokenizer, nat.spec, vocab=vocab)
        row = {}
        for label, coll in (("native", nat), ("python", py)):
            coll.collate(samples)  # warm caches / store
            t0 = time.perf_counter()
            for _ in range(args.reps):
                coll.collate(samples)
            dt = (time.perf_counter() - t0) / args.reps
            row[label] = {"ms_per_batch": round(dt * 1e3, 2),
                          "samples_per_sec": round(len(samples) / dt)}
        row["speedup"] = round(row["python"]["ms_per_batch"]
                               / row["native"]["ms_per_batch"], 2)
        out["buckets"][str(key)] = row
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
