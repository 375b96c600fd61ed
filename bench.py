#!/usr/bin/env python
"""Benchmark: batched GQA inference throughput (questions/sec/chip).

North star (BASELINE.json): >= 10,000 GQA questions/sec/chip on the
flagship ISubGVQA model — question transformer + scene-graph masked-GAT
forward with discrete subgraph extraction — at GQA-realistic shapes.
Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "questions/sec/chip",
     "vs_baseline": N/10000}

Methodology (honest at GQA shapes):

* the fixture uses the **GQA-realistic heavy-tailed size mix**
  (``SyntheticGQA(shape_mix="gqa")``: ~1-120-node graphs, mean ~15,
  ~30% questions >16 tokens), so every size bucket the Trainer ships
  (node caps 16/32/64/128 x question lens 16/32) actually exercises;
* every bucket is timed on its own stream of *distinct* full batches
  (the tunnel dedups identical executions); buckets with too few real
  samples get extra batches by cycling their members — never silently
  dropped;
* the headline is the **mix-blended** throughput: per-question time
  averaged over buckets weighted by each bucket's share of the sample
  mix, plus a per-bucket breakdown on stderr;
* FLOPs = XLA ``cost_analysis`` (which cannot see inside Pallas
  kernels) **plus the analytic per-kernel FLOP models**
  (``ops/pallas/gat_kernel.py:fused_gat_layer_flops`` /
  ``metalayer_kernel_flops``), making the reported implementation-FLOP
  count exact rather than a lower bound — validated: XLA-visible
  (74.2 GF) + analytic kernels (141.5 GF) = 215.7 GF vs 218.1 GF for
  the full op-by-op XLA path at the same (128-batch, 32-node) shape.
  MFU divides that rate by the nominal v5e bf16 peak.

``python bench.py --full`` additionally benchmarks the three other
samplers (imle / aimle / simple) and the jitted *training* step for
each (which runs the differentiable fused Pallas conv,
``ops/pallas/gat_train.py``), writing a breakdown table to
``docs/bench_details.md``.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import math
import sys
import time

import jax
import numpy as np

BASELINE_QPS = 10_000.0
# Nominal TPU v5e bf16 peak.  (Earlier rounds used a "39 TFLOP/s
# practical peak" from a tunnel microbenchmark; the full fused program
# sustains ~65 TFLOP/s of implementation FLOPs in healthy windows, so
# that figure was a measurement artifact — the tunnel dedups/congests
# microbenchmarks, exactly as CLAUDE.md warns.  MFU is reported
# against nominal.)
NOMINAL_PEAK_TFLOPS = 197.0


def _pack_arg(s):
    """argparse type for kernel_pack: an int, "auto", or "none"."""
    if s.lower() in ("none", "off"):
        return None
    if s.lower() == "auto":
        return "auto"
    return int(s)


def _cfg(sampler: str, batch_size: int, dtype: str,
         node_caps=(16, 32, 64, 128), kernel_pack="auto"):
    from isubgvqa_tpu.config import Config

    return Config(
        batch_size=batch_size,
        compute_dtype=dtype,
        sampler_type=sampler,
        sample_k=3,
        question_len=32,
        max_nodes_per_graph=128,
        max_edges_per_graph=384,
        bucket_node_caps=tuple(node_caps),
        kernel_pack=kernel_pack,
    )


def build_bucket_streams(ds, collators, batch_size: int,
                         min_timed: int = 4):
    """Per-bucket streams of pairwise-distinct full batches.

    Routing uses THE rule the Trainer ships
    (:func:`isubgvqa_tpu.data.batching.route_to_buckets` — shared
    helper, so the bench cannot drift from the iterator's
    distribution).  The tunnel dedups identical inputs, so every timed
    batch must be pairwise-distinct: each batch draws a fresh random
    composition/order (seeded per bucket — deterministic across runs)
    with a redraw on the rare index-tuple collision.  A 1-member
    bucket cannot produce distinct batches at all — it is timed anyway
    but the timing code flags it (``distinct_inputs: false``) as a
    dedup-cache artifact."""
    from isubgvqa_tpu.data.batching import route_to_buckets

    per_bucket = route_to_buckets(ds, collators)
    b = batch_size
    n_total = sum(len(m) for m in per_bucket.values())
    bucket_batches, bucket_weight = {}, {}
    for key, members in per_bucket.items():
        if not members:
            continue
        bucket_weight[key] = len(members) / n_total
        n_need = max(min_timed + 1, math.ceil(len(members) / b))
        gen = np.random.default_rng(
            [0xB37C4] + [int(v) for v in np.atleast_1d(key)])
        batches, seen = [], set()
        for i in range(n_need):
            for _ in range(16):
                if len(members) >= b:
                    idx = gen.permutation(len(members))[:b]
                else:
                    idx = gen.integers(0, len(members), size=b)
                t = tuple(idx.tolist())
                if t not in seen or len(members) == 1:
                    seen.add(t)
                    break
            batch, _ = collators[key].collate([ds[members[j]] for j in idx])
            batches.append(batch)
        bucket_batches[key] = batches
    return bucket_batches, bucket_weight


def build_bench_setup(cfg, num_batches: int = 12, min_timed: int = 4):
    """Model + per-bucket streams of distinct full batches.

    Returns ``bucket_batches: key -> [GraphBatch]`` (first is warmup)
    and ``bucket_weight: key -> fraction of the sample mix`` so the
    blended number reflects the true size distribution, not the timed
    batch count."""
    from isubgvqa_tpu.data import (AnswerMap, HashWordTokenizer,
                                   SceneGraphVocab, SyntheticGQA)
    from isubgvqa_tpu.data.build import build_bucket_collators
    from isubgvqa_tpu.models.build import (build_model, init_model,
                                           make_aimle_states)

    vocab = SceneGraphVocab.build(cfg.meta_dir, seed=cfg.seed)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=cfg.batch_size * num_batches,
                      seed=0, shape_mix="gqa")
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    collators = build_bucket_collators(cfg, tok, vocab,
                                       batch_size=cfg.batch_size)

    bucket_batches, bucket_weight = build_bucket_streams(
        ds, collators, cfg.batch_size, min_timed)

    cfg = dataclasses.replace(cfg, num_answers=len(answers))
    model = build_model(cfg, vocab)
    aimle_states = make_aimle_states(cfg)
    any_batch = next(iter(bucket_batches.values()))[0]
    params, batch_stats = init_model(model, any_batch,
                                     aimle_states=aimle_states)
    return model, params, batch_stats, bucket_batches, bucket_weight, \
        cfg, aimle_states, ds, collators


def _flops_per_exec(fn, *args) -> float:
    """AOT cost analysis.  Pass the already-jitted function (not a
    fresh wrapper) so the lowered program matches the timed executable
    and the compilation cache can reuse it."""
    try:
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _kernel_flops_per_batch(cfg, batch) -> float:
    """Analytic FLOPs of the Pallas kernels XLA cost_analysis cannot
    see: 4 fused GAT layers + 1 fused MetaLayer + the fused question
    stack (4 encoder + 3 decoder transformer layers) at inference.
    Validated against the op-by-op XLA path's cost analysis (within
    1-2%; see module docstring and
    test_text_flops_model_matches_xla_cost_analysis)."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import (fused_gat_layer_flops,
                                                   metalayer_kernel_flops)
    from isubgvqa_tpu.ops.pallas.text_kernel import (
        text_stack_flops_per_batch)
    b, n = batch.node_tokens.shape[:2]
    e = batch.edge_src.shape[1]
    masked_layers = sum(1 for m in cfg.mgat_masks if m != 1.0)
    unmasked = len(cfg.mgat_masks) - masked_layers
    per_graph = (unmasked * fused_gat_layer_flops(n, e, fuse_instr=True)
                 + masked_layers * fused_gat_layer_flops(n, e)
                 + metalayer_kernel_flops(n, e))
    text = text_stack_flops_per_batch(
        b, batch.qst_tokens.shape[1], t=cfg.mgat_layers,
        d=cfg.text_emb_dim, f=4 * 512, heads=cfg.num_heads,
        enc_layers=cfg.encoder_layers, dec_layers=cfg.decoder_layers,
        bf16=cfg.compute_dtype == "bfloat16")
    return b * per_graph + text


def _train_kernel_flops_per_batch(cfg, batch) -> float:
    """Analytic FLOPs of the Pallas custom-VJP kernels in one training
    step (forward + backward): 4 trainable GAT convs + 1 MetaLayer +
    the fused question stack (4 encoder + 3 decoder layers with live
    dropout), each a fused forward plus a recompute-structured fused
    backward.  These are *executed* FLOPs (the backward recomputes the
    forward in VMEM), so train MFU reflects what the chip actually
    does."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import metalayer_kernel_flops
    from isubgvqa_tpu.ops.pallas.gat_train import (fused_gatconv_bwd_flops,
                                                   fused_gatconv_fwd_flops)
    from isubgvqa_tpu.ops.pallas.metalayer_train import metalayer_bwd_flops
    from isubgvqa_tpu.ops.pallas.text_train import (
        text_stack_train_flops_per_batch)
    b, n = batch.node_tokens.shape[:2]
    e = batch.edge_src.shape[1]
    layers = len(cfg.mgat_masks)
    per_graph = (layers * (fused_gatconv_fwd_flops(n, e)
                           + fused_gatconv_bwd_flops(n, e))
                 + metalayer_kernel_flops(n, e)
                 + metalayer_bwd_flops(n, e))
    text = text_stack_train_flops_per_batch(
        b, batch.qst_tokens.shape[1], t=cfg.mgat_layers,
        d=cfg.text_emb_dim, f=4 * 512, heads=cfg.num_heads,
        enc_layers=cfg.encoder_layers, dec_layers=cfg.decoder_layers,
        bf16=cfg.compute_dtype == "bfloat16",
        dropout=cfg.dropout > 0.0)
    return b * per_graph + text


def _stream_is_distinct(batches) -> bool:
    """True iff all timed batches are pairwise-distinct inputs (the
    tunnel dedups identical executions — a non-distinct stream reads
    impossibly fast and must be flagged, not blended silently)."""
    digests = set()
    for b in batches:
        h = hashlib.sha1()
        for arr in (b.node_tokens, b.qst_tokens, b.edge_src):
            h.update(np.asarray(arr).tobytes())
        digests.add(h.hexdigest())
    return len(digests) == len(batches)


def _time_stream(run_one, batches) -> float:
    """Median ms/batch over chunks of ~5 distinct batches (the shared
    tunnel shows transient 2-3x congestion episodes a single window
    would average in).  First batch is compile+warmup, excluded."""
    jax.block_until_ready(run_one(batches[0]))
    timed = batches[1:]
    chunk_ms = []
    for i in range(0, len(timed), 5):
        chunk = timed[i:i + 5]
        t0 = time.perf_counter()
        outs = [run_one(b) for b in chunk]
        jax.block_until_ready(outs)
        chunk_ms.append((time.perf_counter() - t0) / len(chunk) * 1e3)
    return float(np.median(chunk_ms))


def _rate_impossible(ms: float, flops_per_batch: float) -> bool:
    """True when the implied FLOP rate exceeds ~95% of nominal peak —
    a physically impossible reading (tunnel dedup artifact) that must
    never be persisted as a bucket's healthy floor."""
    if not flops_per_batch or ms <= 0:
        return False
    return flops_per_batch / (ms / 1e3) > 0.95 * NOMINAL_PEAK_TFLOPS * 1e12


def _time_stream_checked(run_one, batches, flops_per_batch) -> tuple:
    """`_time_stream`, re-timed once if the implied FLOP rate exceeds
    the chip's nominal peak — the tunnel occasionally returns
    impossibly-fast windows (observed: a 16 ms/batch 'simple' read
    that interleaved re-measurement put at the same ~56 ms as gumbel).
    Returns (ms, retimed: bool); keeps the SLOWER, physically-possible
    measurement."""
    ms = _time_stream(run_one, batches)
    if _rate_impossible(ms, flops_per_batch):
        ms = max(ms, _time_stream(run_one, batches))
        return ms, True
    return ms, False


# ---------------------------------------------------------------- bucket
# timing profile: the symmetric guard to the too-fast check above.  The
# shared tunnel shows transient 2-3x congestion episodes (CLAUDE.md);
# a bucket reading much slower than its last-healthy time is re-timed
# once and, if still slow, flagged ``congested`` so the blended
# headline carries the annotation instead of silently absorbing a bad
# window (round-3's (64,16) bucket read 162 ms vs a healthy 101 ms).
# The profile persists the FASTEST time seen per (mode, sampler,
# batch, bucket, pack) key under ``~/.cache/isubgvqa_tpu`` — wiped with
# the compile cache on sandbox resets, so it never outlives the code
# it measured.  ``ISUBGVQA_BENCH_PROFILE=0`` disables.
CONGESTION_FACTOR = 1.5


def _profile_path() -> str:
    import os

    override = os.environ.get("ISUBGVQA_BENCH_PROFILE")
    if override in ("0", "off"):
        return ""
    if override:
        return override
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "isubgvqa_tpu", "bench_profile.json")


def _load_profile() -> dict:
    import os

    path = _profile_path()
    if path and os.path.isfile(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}
    return {}


def _store_profile_time(profile: dict, key: str, ms: float) -> None:
    import os

    path = _profile_path()
    if not path:
        return
    prior = profile.get(key)
    if prior is not None and prior <= ms:
        return
    profile[key] = round(ms, 3)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(profile, f, indent=0, sort_keys=True)


def _time_stream_guarded(run_one, batches, flops_per_batch,
                         profile: dict, profile_key: str) -> tuple:
    """Both guards: too-fast (dedup artifact -> keep slower) and
    too-slow vs the stored last-healthy profile (congestion -> re-time
    once, keep faster, flag if still > CONGESTION_FACTOR x healthy).
    Returns (ms, retimed, congested)."""
    ms, retimed = _time_stream_checked(run_one, batches, flops_per_batch)
    prior = profile.get(profile_key) if profile_key else None
    congested = False
    if prior is not None and ms > CONGESTION_FACTOR * prior:
        # the re-time replays a stream the tunnel has already executed
        # once — exactly the dedup condition — so it must go through
        # the too-fast check too, or a dedup artifact wins the min()
        # and poisons the stored healthy floor
        ms2, _ = _time_stream_checked(run_one, batches, flops_per_batch)
        ms = min(ms, ms2)
        retimed = True
        congested = ms > CONGESTION_FACTOR * prior
    if profile_key and not congested and not _rate_impossible(
            ms, flops_per_batch):
        _store_profile_time(profile, profile_key, ms)
    return ms, retimed, congested


def bench_inference(sampler: str = "gumbel", batch_size: int = 2048,
                    iters: int = 12, dtype: str = "bfloat16",
                    node_caps=(16, 32, 64, 128), kernel_pack="auto"):
    """-> dict with blended qps/chip, per-bucket breakdown, exact MFU."""
    cfg = _cfg(sampler, batch_size, dtype, node_caps, kernel_pack)
    (model, params, batch_stats, bucket_batches, bucket_weight, cfg,
     aimle_states, _, _) = build_bench_setup(cfg, iters)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch_stats = jax.device_put(batch_stats, dev)

    @jax.jit
    def forward(params, batch, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False, aimle_states=aimle_states,
                          rngs={"sampler": key})
        return out.logits, out.node_mask

    key = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"
    profile = _load_profile()
    per_bucket = {}
    blended_t_q = 0.0          # seconds per question, mix-weighted
    blended_flops_q = 0.0
    small_frac = 0.0
    congested_buckets = []
    for bkey in sorted(bucket_batches):
        batches = jax.device_put(bucket_batches[bkey], dev)
        xla_flops = _flops_per_exec(forward, params, batches[0], key)
        kflops = _kernel_flops_per_batch(cfg, batches[0]) if on_tpu else 0.0
        total_flops = xla_flops + kflops
        pkey = (f"infer:{sampler}:{batch_size}:{bkey}:{kernel_pack}:{dtype}"
                if on_tpu else "")
        ms, retimed, congested = _time_stream_guarded(
            lambda b: forward(params, b, key), batches, total_flops,
            profile, pkey)
        w = bucket_weight[bkey]
        blended_t_q += w * (ms / 1e3) / batch_size
        blended_flops_q += w * total_flops / batch_size
        if bkey[0] < cfg.max_nodes_per_graph:
            small_frac += w
        per_bucket[str(bkey)] = {
            "ms_per_batch": round(ms, 2),
            "qps": round(batch_size / (ms / 1e3), 1),
            "weight": round(w, 4),
            "batches_timed": len(batches) - 1,
            # per-bucket FLOP rate + MFU (VERDICT r4 item 4): shows
            # where the MXU underfills — small buckets especially
            "tflops_per_sec": round(total_flops / (ms / 1e3) / 1e12, 2),
            "mfu": round(total_flops / (ms / 1e3)
                         / (NOMINAL_PEAK_TFLOPS * 1e12), 4),
        }
        if retimed:
            per_bucket[str(bkey)]["retimed"] = True
        if congested:
            per_bucket[str(bkey)]["congested"] = True
            congested_buckets.append(str(bkey))
        if not _stream_is_distinct(bucket_batches[bkey][1:]):
            per_bucket[str(bkey)]["distinct_inputs"] = False

    qps = 1.0 / blended_t_q
    n_chips = max(len(jax.devices()), 1)
    out = {
        "sampler": sampler,
        "qps_per_chip": qps / n_chips,
        "ms_per_batch": blended_t_q * batch_size * 1e3,
        "small_bucket_frac": small_frac,
        "flops_per_question": blended_flops_q,
        "tflops_per_sec": blended_flops_q / blended_t_q / 1e12 / n_chips,
        "mfu": (blended_flops_q / blended_t_q)
               / (NOMINAL_PEAK_TFLOPS * 1e12 * n_chips),
        "per_bucket": per_bucket,
    }
    if congested_buckets:
        out["congested_buckets"] = congested_buckets
    return out


def bench_e2e(sampler: str = "gumbel", batch_size: int = 2048,
              iters: int = 12, dtype: str = "bfloat16",
              node_caps=(16, 32, 64, 128), kernel_pack="auto",
              epochs: int = 3):
    """End-to-end inference pipeline throughput: the REAL bucketed
    iterator (native C++ collate + prefetch thread + host->device
    transfer) feeding the jitted forward — i.e. what a user's eval
    loop actually sustains, host included.  Shuffled iteration keeps
    every dispatched batch distinct (tunnel dedup).  Reported as
    questions/sec/chip over the *real* samples of a full epoch (tail
    batches are partially padded — honest accounting); median of
    ``epochs`` passes."""
    from isubgvqa_tpu.data.batching import iterate_batches_bucketed, prefetch

    cfg = _cfg(sampler, batch_size, dtype, node_caps, kernel_pack)
    (model, params, batch_stats, bucket_batches, _, cfg,
     aimle_states, ds, collators) = build_bench_setup(cfg, iters)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch_stats = jax.device_put(batch_stats, dev)

    @jax.jit
    def forward(params, batch, key):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False, aimle_states=aimle_states,
                          rngs={"sampler": key})
        return out.logits, out.node_mask

    key = jax.random.PRNGKey(0)
    for batches in bucket_batches.values():       # compile every bucket
        jax.block_until_ready(forward(params, batches[0], key))
    # a partial tail batch reuses its bucket's executable (same shape)

    epoch_s, n_questions = [], 0
    for ep in range(epochs):
        # group_by_bucket: eval order is free, and every bucket switch
        # re-dispatches a different executable (a tunnel sync, ~0.3 s);
        # grouped order pays num_buckets switches per epoch instead of
        # ~num_batches.  shuffle still randomizes batch composition
        # (distinct inputs for the tunnel dedup).
        it = prefetch(iterate_batches_bucketed(
            ds, collators, shuffle=True, seed=100 + ep, drop_last=False,
            group_by_bucket=True),
            depth=3, device=dev)
        in_flight = []
        n_q = 0
        t0 = time.perf_counter()
        for batch, meta in it:
            in_flight.append(forward(params, batch, key))
            n_q += meta.num_real
            if len(in_flight) > 4:        # bounded pipelined dispatch
                jax.block_until_ready(in_flight.pop(0))
        jax.block_until_ready(in_flight)
        epoch_s.append(time.perf_counter() - t0)
        n_questions = n_q
    n_chips = max(len(jax.devices()), 1)
    sec = float(np.median(epoch_s))
    return {
        "sampler": sampler,
        "e2e_qps_per_chip": n_questions / sec / n_chips,
        # fastest epoch = healthy-window estimate (congestion episodes
        # depress whole epochs; the median can land inside one)
        "e2e_qps_best": n_questions / float(np.min(epoch_s)) / n_chips,
        "questions_per_epoch": n_questions,
        "epoch_seconds": [round(s, 3) for s in epoch_s],
    }


def bench_explain(sampler: str = "gumbel", batch_size: int = 2048,
                  dtype: str = "bfloat16", node_caps=(16, 32, 64, 128),
                  kernel_pack="auto", dev_size: int = 20480,
                  passes: int = 3):
    """End-to-end explanation-extraction throughput (VERDICT r4 item
    6): the REAL ``run_token_coo_exp`` pipeline — bucketed host
    iteration + native collate + prefetch + jitted forward with
    device-side argmax + the vectorized host metric pass — over a
    GQA-realistic synthetic dev set, questions/sec/chip.

    This measures the path the rebuild exists to accelerate (the
    reference's batch=1 Python loop, ``run_token_coo.py:49-185``).
    The first pass pays compiles and is discarded; later passes vary
    the eval seed so every dispatch stays distinct for the tunnel's
    dedup."""
    import contextlib
    import dataclasses
    import io
    import types

    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.explain import run_token_coo_exp
    from isubgvqa_tpu.models.build import (build_model, init_model,
                                           make_aimle_states)

    cfg = _cfg(sampler, batch_size, dtype, node_caps, kernel_pack)
    cfg = dataclasses.replace(
        cfg, synthetic=True, synthetic_size=dev_size * 4,
        synthetic_shape_mix="gqa",
        eval_batch_factor=1,      # eval batches at the benched size
    )
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    aimle_states = make_aimle_states(cfg)
    sample, _ = next(iter(_first_dev_batch(data)))
    params, batch_stats = init_model(model, sample,
                                     aimle_states=aimle_states)
    dev = jax.devices()[0]
    state = types.SimpleNamespace(
        params=jax.device_put(params, dev),
        batch_stats=jax.device_put(batch_stats, dev),
        aimle_states=aimle_states)

    n, times = 0, []
    for p in range(passes + 1):
        buf = io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            res = run_token_coo_exp(model=model, state=state, data=data,
                                    cfg=cfg, split="dev", seed=1000 + p)
        dt = time.perf_counter() - t0
        n = res.num_samples
        if p > 0:                    # pass 0 = compile + warmup
            times.append(dt)
    n_chips = max(len(jax.devices()), 1)
    sec = float(np.median(times))
    return {
        "sampler": sampler,
        "explain_qps_per_chip": n / sec / n_chips,
        "explain_qps_best": n / float(np.min(times)) / n_chips,
        "questions": n,
        "pass_seconds": [round(s, 3) for s in times],
    }


def _first_dev_batch(data):
    from isubgvqa_tpu.data.batching import iterate_batches

    return iterate_batches(data.datasets["dev"], data.collators["dev"])


def bench_train_step(sampler: str, batch_size: int = 256, iters: int = 8,
                     dtype: str = "bfloat16", node_caps=(16, 32, 64, 128),
                     train_pack=None, multistep: int = 1):
    """Jitted full training step (fwd + bwd + Adam) throughput,
    mix-blended over buckets like inference.

    ``multistep > 1`` measures the Trainer's ``cfg.multistep`` path:
    K same-bucket batches stacked into one lax.scan program
    (``train/steps.py:make_multistep_train_step``), one dispatch per K
    optimizer updates; reported per *step*, i.e. group time / K."""
    from isubgvqa_tpu.train.schedule import make_optimizer
    from isubgvqa_tpu.train.state import create_train_state
    from isubgvqa_tpu.train.steps import (make_multistep_train_step,
                                          make_train_step)

    multistep = max(int(multistep), 1)
    min_timed = 4
    if multistep > 1:
        # enough distinct batches PER BUCKET for a warmup group +
        # >=2 timed groups of K (min_timed bounds the small buckets,
        # which otherwise get only ~5 batches)
        iters = max(iters, 3 * multistep)
        min_timed = 3 * multistep - 1
    cfg = _cfg(sampler, batch_size, dtype, node_caps, train_pack)
    (model, params, batch_stats, bucket_batches, bucket_weight, cfg,
     _, _, _) = build_bench_setup(cfg, iters, min_timed=min_timed)
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=8)
    state = create_train_state(model, optimizer,
                               next(iter(bucket_batches.values()))[0], cfg)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)

    # donate the state exactly as the Trainer does (train/loop.py:62-64,
    # cfg.donate_state default): without donation XLA keeps a second
    # copy of params+Adam state alive per step
    single_step = jax.jit(make_train_step(model, optimizer, cfg),
                          donate_argnums=0)
    if multistep > 1:
        step = jax.jit(make_multistep_train_step(model, optimizer, cfg),
                       donate_argnums=0)
    else:
        step = single_step
    rng = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"
    profile = _load_profile()

    blended_t_q = 0.0
    blended_flops_q = 0.0
    per_bucket = {}
    congested_buckets = []
    state_box = {"s": state}

    def run_one(b):
        state_box["s"], m = step(state_box["s"], b, rng)
        return m

    for bkey in sorted(bucket_batches):
        stream = bucket_batches[bkey]
        if multistep > 1:
            n_groups = len(stream) // multistep
            stream = [jax.tree_util.tree_map(
                          lambda *xs: np.stack(xs),
                          *stream[i * multistep:(i + 1) * multistep])
                      for i in range(n_groups)]
        batches = jax.device_put(stream, dev)
        # FLOPs/question must be dispatch-mode-invariant (the K scanned
        # updates run exactly the single-step math K times), so the
        # XLA-visible count always comes from lowering the SINGLE-step
        # program — round 3 read the scanned program's cost analysis,
        # which under-counts the scan body (3,097 vs 5,700 MFLOPs/q for
        # identical per-question math; pinned by
        # test_bench_streams.py::test_multistep_flops_accounting_is_
        # dispatch_invariant).  Abstract lowering only; the timed
        # executable is still the scanned one.
        single_batch = jax.device_put(bucket_batches[bkey][0], dev)
        xla_flops = _flops_per_exec(single_step, state_box["s"],
                                    single_batch, rng)
        kflops = (_train_kernel_flops_per_batch(cfg, bucket_batches[bkey][0])
                  if on_tpu else 0.0)
        pkey = (f"train:{sampler}:{batch_size}:{bkey}:{train_pack}:"
                f"{dtype}:k{multistep}" if on_tpu else "")
        ms, retimed, congested = _time_stream_guarded(
            run_one, batches, (xla_flops + kflops) * multistep,
            profile, pkey)
        ms /= multistep
        w = bucket_weight[bkey]
        blended_t_q += w * (ms / 1e3) / batch_size
        blended_flops_q += w * (xla_flops + kflops) / batch_size
        per_bucket[str(bkey)] = {"ms_per_step": round(ms, 2),
                                 "weight": round(w, 4)}
        if retimed:
            per_bucket[str(bkey)]["retimed"] = True
        if congested:
            per_bucket[str(bkey)]["congested"] = True
            congested_buckets.append(str(bkey))
        if not _stream_is_distinct(bucket_batches[bkey][1:]):
            per_bucket[str(bkey)]["distinct_inputs"] = False
    n_chips = max(len(jax.devices()), 1)
    out = {
        "sampler": sampler,
        "multistep": multistep,
        "batch_size": batch_size,
        "train_qps_per_chip": 1.0 / blended_t_q / n_chips,
        "ms_per_step": blended_t_q * batch_size * 1e3,
        "flops_per_question": blended_flops_q,
        "tflops_per_sec": blended_flops_q / blended_t_q / 1e12 / n_chips,
        "mfu": (blended_flops_q / blended_t_q)
               / (NOMINAL_PEAK_TFLOPS * 1e12 * n_chips),
        "per_bucket": per_bucket,
    }
    if congested_buckets:
        out["congested_buckets"] = congested_buckets
    return out


def _round_tree(x):
    if isinstance(x, dict):
        return {k: _round_tree(v) for k, v in x.items()}
    return round(x, 4) if isinstance(x, float) else x


def main():
    from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="bench all samplers + train steps; write "
                         "docs/bench_details.md")
    # the knee of the measured batch-size curve: blended q/s was
    # 21.0k @512, 24.5k @1024, 26.6k @2048, 26.9k @4096 — per-dispatch
    # overhead through the tunnel amortizes by 2048 and the extra
    # host collation beyond it buys ~1%
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=22)
    ap.add_argument("--node-caps", type=int, nargs="+",
                    default=[16, 32, 64, 128],
                    help="bucket node caps to measure (experimentation)")
    ap.add_argument("--pack", type=_pack_arg, default="auto",
                    help="graphs per fused-GAT grid program: an int, "
                         "'auto' (default; per-shape heuristic) or "
                         "'none' (cfg.kernel_pack)")
    ap.add_argument("--train-pack", type=_pack_arg, default="auto",
                    help="kernel_pack for the --full training-step "
                         "benches (int, 'auto' or 'none')")
    ap.add_argument("--train-batch", type=int, default=256,
                    help="training-step batch size (default = the "
                         "reference's bs 256; raise to measure the "
                         "saturated step)")
    ap.add_argument("--train-batch-sat", type=int, default=1024,
                    help="extra saturated-batch gumbel training row in "
                         "--full (measured knee of the train-step "
                         "batch curve: 45.3 TFLOP/s @256, 53.8 @512, "
                         "58.5 @1024, 62.3 @2048 on the 32-cap "
                         "bucket); 0 disables")
    ap.add_argument("--train-multistep", type=int, default=8,
                    help="K for the extra multi-step-dispatch training "
                         "row in --full (cfg.multistep: K scanned "
                         "updates per dispatch); 1 disables the row")
    ap.add_argument("--e2e", action="store_true",
                    help="also measure the end-to-end pipeline "
                         "(bucketed iterator + native collate + "
                         "prefetch + transfer + forward); implied by "
                         "--full")
    ap.add_argument("--explain", action="store_true",
                    help="also measure the end-to-end explanation "
                         "pipeline (run_token_coo_exp: forward + "
                         "device argmax + vectorized host metrics); "
                         "implied by --full")
    args = ap.parse_args()

    head = bench_inference("gumbel", args.batch_size, args.iters,
                           node_caps=tuple(args.node_caps),
                           kernel_pack=args.pack)
    result = {
        "metric": "GQA questions/sec/chip (batched inference, ISubGVQA "
                  "forward + discrete subgraph extraction, GQA-realistic "
                  "heavy-tailed size mix, bucket-blended)",
        "value": round(head["qps_per_chip"], 1),
        "unit": "questions/sec/chip",
        "vs_baseline": round(head["qps_per_chip"] / BASELINE_QPS, 3),
    }
    if head.get("congested_buckets"):
        # tunnel congestion survived the re-time on these buckets: the
        # blended headline is depressed accordingly (see per-bucket
        # breakdown on stderr)
        result["congested_buckets"] = head["congested_buckets"]
    print(json.dumps(_round_tree(head)), file=sys.stderr)

    e2e = None
    if args.e2e or args.full:
        e2e = bench_e2e("gumbel", args.batch_size, args.iters,
                        node_caps=tuple(args.node_caps),
                        kernel_pack=args.pack)
        print(json.dumps(_round_tree(e2e)), file=sys.stderr)

    expl = None
    if args.explain or args.full:
        expl = bench_explain("gumbel", args.batch_size,
                             node_caps=tuple(args.node_caps),
                             kernel_pack=args.pack)
        print(json.dumps(_round_tree(expl)), file=sys.stderr)

    if args.full:
        rows = [head]
        train_rows = []
        for sampler in ("imle", "aimle", "simple"):
            rows.append(bench_inference(sampler, args.batch_size,
                                        args.iters,
                                        node_caps=tuple(args.node_caps),
                                        kernel_pack=args.pack))
            print(json.dumps(_round_tree(rows[-1])), file=sys.stderr)
        for sampler in ("gumbel", "imle", "aimle", "simple"):
            train_rows.append(bench_train_step(sampler, args.train_batch,
                                               node_caps=tuple(args.node_caps),
                                               train_pack=args.train_pack))
            print(json.dumps(_round_tree(train_rows[-1])), file=sys.stderr)
        if args.train_batch_sat and args.train_batch_sat != args.train_batch:
            train_rows.append(bench_train_step(
                "gumbel", args.train_batch_sat,
                node_caps=tuple(args.node_caps),
                train_pack=args.train_pack))
            print(json.dumps(_round_tree(train_rows[-1])), file=sys.stderr)
        if args.train_multistep > 1:
            train_rows.append(bench_train_step(
                "gumbel", args.train_batch,
                node_caps=tuple(args.node_caps),
                train_pack=args.train_pack,
                multistep=args.train_multistep))
            print(json.dumps(_round_tree(train_rows[-1])), file=sys.stderr)
        _write_details(rows, train_rows, args, e2e, expl)

    print(json.dumps(result))


def _write_details(rows, train_rows, args, e2e=None, expl=None):
    lines = [
        "# Benchmark surface (last `bench.py --full` run)",
        "",
        f"Batch {args.batch_size} (train {args.train_batch}), "
        "GQA-realistic heavy-tailed "
        "synthetic size mix (`shape_mix=\"gqa\"`), bf16 compute, one "
        "chip.  Every bucket is timed on its own stream of distinct "
        "batches; the blended number weights buckets by their share of "
        "the sample mix.  Implementation FLOPs are exact (XLA cost "
        "analysis + analytic Pallas-kernel models, validated within 1% "
        "of the op-by-op path); MFU is against the nominal v5e bf16 "
        f"peak of {NOMINAL_PEAK_TFLOPS:.0f} TFLOP/s.",
        "",
        "## Inference (eval forward + subgraph extraction)",
        "",
        "| sampler | questions/s/chip | ms/batch | TFLOP/s | MFU "
        "| MFLOPs/question |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        name = r["sampler"]
        if r.get("congested_buckets"):
            name += f" (congested: {','.join(r['congested_buckets'])})"
        lines.append(
            f"| {name} | {r['qps_per_chip']:.0f} "
            f"| {r['ms_per_batch']:.1f} | {r['tflops_per_sec']:.1f} "
            f"| {r['mfu']*100:.1f}% "
            f"| {r['flops_per_question']/1e6:.0f} |")
    lines += [
        "",
        "### Per-bucket (gumbel): (node cap, question len) -> "
        "ms/batch, share of mix",
        "",
    ]
    for bkey, d in rows[0]["per_bucket"].items():
        tag = " **congested**" if d.get("congested") else ""
        mfu = (f", {d['tflops_per_sec']} TFLOP/s ({d['mfu']*100:.1f}% MFU)"
               if "mfu" in d else "")
        lines.append(f"- `{bkey}`: {d['ms_per_batch']} ms/batch, "
                     f"{d['qps']} q/s, weight {d['weight']}{mfu}{tag}")
    if e2e is not None:
        lines += [
            "",
            "## End-to-end pipeline (bucketed iterator + native C++ "
            "collate + prefetch + transfer + forward)",
            "",
            f"- {e2e['e2e_qps_per_chip']:.0f} questions/s/chip over "
            f"{e2e['questions_per_epoch']} real samples/epoch "
            f"(median of {len(e2e['epoch_seconds'])} epochs: "
            f"{e2e['epoch_seconds']} s) — host collation keeps the "
            "device fed; the gap to the device-only blended number is "
            "tail-batch padding + dispatch pipelining.",
        ]
    if expl is not None:
        lines += [
            "",
            "## End-to-end explanation pipeline (run_token_coo_exp: "
            "forward + device argmax + vectorized host metrics)",
            "",
            f"- {expl['explain_qps_per_chip']:.0f} questions/s/chip "
            f"(best window {expl['explain_qps_best']:.0f}) over "
            f"{expl['questions']} dev questions "
            f"(passes: {expl['pass_seconds']} s).",
        ]
    lines += [
        "",
        f"## Training step (forward + backward + Adam, batch "
        f"{args.train_batch}, fused Pallas conv custom-VJP path)",
        "",
        "Implementation FLOPs count the backward kernels' in-VMEM "
        "recompute (executed FLOPs), XLA cost analysis + analytic "
        "models of the 5 custom-VJP kernel pairs.",
        "",
        "| sampler | questions/s/chip | ms/step | TFLOP/s | MFU "
        "| MFLOPs/question |",
        "|---|---|---|---|---|---|",
    ]
    for r in train_rows:
        name = r["sampler"]
        if r.get("batch_size", args.train_batch) != args.train_batch:
            name += f" (batch {r['batch_size']})"
        if r.get("multistep", 1) > 1:
            name += f" (multistep {r['multistep']})"
        if r.get("congested_buckets"):
            name += f" (congested: {','.join(r['congested_buckets'])})"
        lines.append(f"| {name} | {r['train_qps_per_chip']:.0f} "
                     f"| {r['ms_per_step']:.1f} "
                     f"| {r['tflops_per_sec']:.1f} | {r['mfu']*100:.1f}% "
                     f"| {r['flops_per_question']/1e6:.0f} |")
    lines.append("")
    import os

    os.makedirs("docs", exist_ok=True)
    with open("docs/bench_details.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
