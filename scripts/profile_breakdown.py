#!/usr/bin/env python
"""Per-op TPU time breakdown for the inference forward / training step.

Runs a stream of distinct batches from one size bucket under
``jax.profiler.trace`` and aggregates the device's "XLA Ops" lane from
the exported Chrome trace, printing each op's share of device time.
This is the measurement tool behind the optimization ladder in
README.md — use it before touching any kernel.

Usage:
    python scripts/profile_breakdown.py --bucket 16 16 --batch-size 2048
    python scripts/profile_breakdown.py --train --batch-size 256
    python scripts/profile_breakdown.py --top 40 --group

Notes (sandbox TPU): the axon tunnel dedups identical executions, so
the profiled stream reuses bench.py's distinct-batch builder; the
first execution is compile+warmup and runs before the trace starts.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import _cfg, _pack_arg, build_bench_setup  # noqa: E402
from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _aggregate_trace(trace_dir: str):
    """-> (op_name -> total us on the 'XLA Ops' lane, module total us)."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise RuntimeError(f"no trace produced under {trace_dir}")
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops = collections.Counter()
    counts = collections.Counter()
    module_us = 0.0
    for e in ev:
        if e.get("ph") != "X" or not pids.get(e["pid"], "").startswith("/device"):
            continue
        lane = tids.get((e["pid"], e["tid"]), "")
        if lane == "XLA Ops":
            ops[e["name"]] += e["dur"]
            counts[e["name"]] += 1
        elif lane == "XLA Modules":
            module_us += e["dur"]
    return ops, counts, module_us


_GROUP_RE = re.compile(r"\.\d+$")


def _group(name: str) -> str:
    """Strip the .N instance suffix so repeated ops aggregate."""
    return _GROUP_RE.sub("", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, nargs=2, default=[16, 16],
                    metavar=("NODE_CAP", "QLEN"),
                    help="size bucket to profile (node cap, question len)")
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--train", action="store_true",
                    help="profile the training step instead of inference")
    ap.add_argument("--sampler", default="gumbel")
    ap.add_argument("--iters", type=int, default=8,
                    help="distinct batches to run under the trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true",
                    help="aggregate op instances (fusion.3 -> fusion)")
    ap.add_argument("--pack", type=_pack_arg, default="auto",
                    help="kernel_pack: an int, 'auto' (default) or "
                         "'none'")
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    cfg = _cfg(args.sampler, args.batch_size, "bfloat16",
               kernel_pack=args.pack)
    (model, params, batch_stats, bucket_batches, _, cfg, aimle_states,
     _, _) = build_bench_setup(cfg, num_batches=max(args.iters + 2, 8))
    key = tuple(args.bucket)
    if key not in bucket_batches:
        raise SystemExit(f"bucket {key} not in {sorted(bucket_batches)}")
    batches = bucket_batches[key]
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch_stats = jax.device_put(batch_stats, dev)
    batches = jax.device_put(batches, dev)
    rng = jax.random.PRNGKey(0)

    if args.train:
        from isubgvqa_tpu.train.schedule import make_optimizer
        from isubgvqa_tpu.train.state import create_train_state
        from isubgvqa_tpu.train.steps import make_train_step
        optimizer = make_optimizer(cfg.lr, steps_per_epoch=8)
        state = jax.device_put(
            create_train_state(model, optimizer, batches[0], cfg), dev)
        step = jax.jit(make_train_step(model, optimizer, cfg),
                       donate_argnums=0)
        box = {"s": state}

        def run_one(b):
            box["s"], m = step(box["s"], b, rng)
            return m
    else:
        @jax.jit
        def forward(params, batch, k):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=False, aimle_states=aimle_states,
                rngs={"sampler": k})
            return out.logits, out.node_mask

        def run_one(b):
            return forward(params, b, rng)

    print(f"compiling {'train step' if args.train else 'forward'} "
          f"@ bucket {key}, batch {args.batch_size} ...", file=sys.stderr)
    jax.block_until_ready(run_one(batches[0]))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="isubg_prof_")
    stream = (batches[1:] * ((args.iters // max(len(batches) - 1, 1)) + 1)
              )[:args.iters]
    with jax.profiler.trace(trace_dir):
        outs = [run_one(b) for b in stream]
        jax.block_until_ready(outs)

    ops, counts, module_us = _aggregate_trace(trace_dir)
    if args.group:
        g_ops, g_counts = collections.Counter(), collections.Counter()
        for k, v in ops.items():
            g_ops[_group(k)] += v
            g_counts[_group(k)] += counts[k]
        ops, counts = g_ops, g_counts
    total = sum(ops.values())
    n = len(stream)
    print(f"\ndevice time: {total/1e3/n:.3f} ms/batch on XLA Ops "
          f"({module_us/1e3/n:.3f} ms/batch module total, {n} batches)")
    print(f"{'us/batch':>10}  {'%':>6}  {'calls':>6}  op")
    for name, us in ops.most_common(args.top):
        print(f"{us/n:10.1f}  {us/total*100:6.2f}  {counts[name]//n:6d}  "
              f"{name[:90]}")
    rest = total - sum(us for _, us in ops.most_common(args.top))
    if rest > 0:
        print(f"{rest/n:10.1f}  {rest/total*100:6.2f}  {'':6}  (rest)")
    print(f"\nraw trace: {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
