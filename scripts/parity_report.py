#!/usr/bin/env python
"""One-command real-GQA parity harness.

Given real GQA data + the meta-info assets + a reference PyTorch
checkpoint (``run_token_coo.py:23-45`` in the reference), this:

1. validates (or fetches) the eight meta-info assets
   (``tools/fetch_meta_assets.py``),
2. converts the torch ``.pth`` into an orbax checkpoint
   (:func:`isubgvqa_tpu.convert.convert_reference_checkpoint`),
3. runs the sharded batched eval + token-coo explanation metrics on
   the requested split (:func:`isubgvqa_tpu.explain.run_token_coo_exp`
   — the reference's ``run_token_coo.py:145-185`` metric surface),
4. optionally compares per-sample discrete subgraph masks against a
   recorded reference run (``--reference_masks`` npz of qid -> mask)
   and the scalar metrics against recorded reference numbers
   (``--reference_json``),
5. writes ``<out>.json`` + ``<out>.md`` with the metrics and deltas.

Typical real-data invocation::

    python scripts/parity_report.py \
        --torch_ckpt /path/checkpoint_lowest_val_loss.pth \
        --data_dir /path/GQA --meta_src /path/ISubGVQA/meta_info \
        --clip_tokenizer_dir /path/clip_tok \
        --reference_json ref_run_metrics.json --out parity_report

CI exercises the full pipeline on the synthetic fixture with a mini
torch checkpoint (``tests/test_parity_report.py``).

Caveat recorded in the report: the reference evaluates its discrete
samplers *with noise* (masking calls the sampler forward at eval;
``sampling/gumbel.py`` docstring — reference quirk reproduced), so
masked-configuration mask overlap is stochastic-seed-dependent on both
sides; unmasked configurations and answer accuracy are deterministic.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)

METRIC_KEYS = ("accuracy", "accuracy_at", "ans_token_coo",
               "qst_token_coo", "text_token_coo")


def mask_overlap(ours: dict, ref_masks, threshold: float = 0.5) -> dict:
    """Per-sample discrete-subgraph agreement vs a recorded reference
    run: IoU of thresholded node masks + exact-set match rate, averaged
    over the qids both runs saw."""
    import numpy as np

    ious, exact, n, size_mismatch = [], [], 0, 0
    for qid, rec in ours.items():
        if qid not in ref_masks:
            continue
        a = np.asarray(rec["mask"]).reshape(-1) > threshold
        b = np.asarray(ref_masks[qid]).reshape(-1) > threshold
        if a.size != b.size:
            # node-count mismatch (graph translation drift): pad the
            # shorter mask with False so any active node in the tail
            # counts as disagreement in IoU/exact (never truncate — a
            # truncated tail could hide active reference nodes and
            # report perfect agreement exactly when drift occurs)
            size_mismatch += 1
            m = max(a.size, b.size)
            a = np.pad(a, (0, m - a.size))
            b = np.pad(b, (0, m - b.size))
        union = np.logical_or(a, b).sum()
        ious.append(float(np.logical_and(a, b).sum() / union)
                    if union else 1.0)
        exact.append(float(np.array_equal(a, b)))
        n += 1
    if not n:
        return {"mask_iou": float("nan"), "mask_exact": float("nan"),
                "mask_n": 0, "mask_size_mismatch": 0}
    return {"mask_iou": float(np.mean(ious)),
            "mask_exact": float(np.mean(exact)), "mask_n": n,
            "mask_size_mismatch": size_mismatch}


def write_report(out: str, payload: dict) -> None:
    with open(out + ".json", "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    lines = [
        "# Parity report",
        "",
        f"Checkpoint: `{payload['torch_ckpt']}`  ",
        f"Split: {payload['split']}  ·  samples: {payload['num_samples']}"
        f"  ·  sampler: {payload['sampler_type']}"
        f"  ·  mgat_masks: {payload['mgat_masks']}",
        "",
        "| metric | this framework | reference | delta |",
        "|---|---|---|---|",
    ]
    ref = payload.get("reference") or {}
    for k in METRIC_KEYS + ("mask_iou", "mask_exact"):
        if k not in payload["metrics"]:
            continue
        v = payload["metrics"][k]
        r = ref.get(k)
        d = (v - r) if (r is not None and v == v and r == r) else None
        lines.append(
            f"| {k} | {v:.4f} | "
            f"{'-' if r is None else format(r, '.4f')} | "
            f"{'-' if d is None else format(d, '+.4f')} |")
    if payload.get("notes"):
        lines += [""] + [f"> {n}" for n in payload["notes"]]
    lines.append("")
    with open(out + ".md", "w") as f:
        f.write("\n".join(lines))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser("parity_report")
    p.add_argument("--torch_ckpt", required=True,
                   help="reference .pth training checkpoint")
    p.add_argument("--data_dir", default=None, help="real GQA root")
    p.add_argument("--meta_dir", default=None,
                   help="directory already holding the 8 meta assets")
    p.add_argument("--meta_src", default=None,
                   help="fetch+validate meta assets from here first "
                        "(e.g. an upstream ISubGVQA/meta_info checkout)")
    p.add_argument("--clip_tokenizer_dir", default=None,
                   help="CLIP vocab.json/merges.txt (REQUIRED for real "
                        "GQA: the sandbox hash tokenizer is not "
                        "CLIP-id compatible)")
    p.add_argument("--split", default="dev", choices=["dev", "testdev"])
    p.add_argument("--synthetic", action="store_true",
                   help="run on the synthetic fixture (CI path)")
    p.add_argument("--synthetic_size", type=int, default=None)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--reference_json", default=None,
                   help="recorded reference-run metrics to diff against "
                        "(keys among: accuracy accuracy_at ans_token_coo "
                        "qst_token_coo text_token_coo)")
    p.add_argument("--reference_masks", default=None,
                   help="npz of qid -> reference node mask for "
                        "subgraph-overlap parity")
    p.add_argument("--set", action="append", default=[],
                   metavar="KEY=JSONVAL", dest="overrides",
                   help="Config field override, e.g. --set batch_size=8 "
                        "--set bucket_node_caps=[32] (JSON values; "
                        "repeatable) — for scaling the eval to the host")
    p.add_argument("--out", default="parity_report",
                   help="report path prefix (.json/.md appended)")
    p.add_argument("--work_dir", default="./parity_work",
                   help="converted checkpoint + fetched assets land here")
    args = p.parse_args(argv)

    os.makedirs(args.work_dir, exist_ok=True)

    # ---- 1. meta assets -------------------------------------------------
    meta_dir = args.meta_dir
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    import fetch_meta_assets

    if args.meta_src:
        meta_dir = os.path.join(args.work_dir, "meta_info")
        fetch_meta_assets.fetch(args.meta_src, meta_dir)
    if meta_dir and not args.synthetic:
        for w in fetch_meta_assets.validate(meta_dir):
            print(f"meta-asset warning: {w}", file=sys.stderr)

    # ---- 2. convert the checkpoint -------------------------------------
    from isubgvqa_tpu.convert import convert_reference_checkpoint
    from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ckpt_dir, cfg = convert_reference_checkpoint(
        args.torch_ckpt, os.path.join(args.work_dir, "converted"))
    print(f"converted {args.torch_ckpt} -> {ckpt_dir}")

    overrides = {}
    if meta_dir:
        overrides["meta_dir"] = meta_dir
    if args.data_dir:
        overrides["data_dir"] = args.data_dir
    if args.clip_tokenizer_dir:
        overrides["clip_tokenizer_dir"] = args.clip_tokenizer_dir
    if args.synthetic:
        overrides["synthetic"] = True
        if args.synthetic_size:
            overrides["synthetic_size"] = args.synthetic_size
    for kv in args.overrides:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass                                   # bare string value
        if isinstance(v, list):
            v = tuple(v)
        overrides[k] = v
    cfg = dataclasses.replace(cfg, **overrides)

    # ---- 3. restore + eval ---------------------------------------------
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.explain import run_token_coo_exp
    from isubgvqa_tpu.models.build import (build_model, init_model,
                                           make_aimle_states)
    from isubgvqa_tpu.train.state import TrainState

    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    aimle_states = make_aimle_states(cfg)

    first = [data.datasets[args.split][0]]
    batch, _ = data.collators[args.split].collate(first)
    params, batch_stats = init_model(model, batch,
                                     aimle_states=aimle_states)
    restored = ocp.StandardCheckpointer().restore(
        ckpt_dir, target=jax.device_get(
            {"params": params, "batch_stats": batch_stats}))
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=restored["params"], opt_state=(),
                       batch_stats=restored["batch_stats"],
                       aimle_states=aimle_states)
    state = jax.device_put(state, jax.devices()[0])

    collected: dict = {}
    res = run_token_coo_exp(
        model=model, state=state, data=data, cfg=cfg, split=args.split,
        max_batches=args.max_batches, collect_masks=collected)

    # ---- 4. compare ------------------------------------------------------
    metrics = {k: getattr(res, k) for k in METRIC_KEYS}
    notes = []
    if cfg.sampler_type and any(m != 1.0 for m in cfg.mgat_masks):
        notes.append(
            "masked configuration: the reference samples its eval masks "
            "WITH noise (reference quirk, see sampling/gumbel.py), so "
            "mask overlap and coo metrics carry sampler-seed variance "
            "on both sides; answer accuracy of unmasked layers is "
            "deterministic.")
    if args.reference_masks:
        ref_masks = dict(np.load(args.reference_masks))
        metrics.update(mask_overlap(collected, ref_masks))
    reference = None
    if args.reference_json:
        with open(args.reference_json) as f:
            reference = json.load(f)

    payload = {
        "torch_ckpt": args.torch_ckpt,
        "checkpoint": ckpt_dir,
        "split": args.split,
        "synthetic": bool(args.synthetic),
        "num_samples": res.num_samples,
        "sampler_type": cfg.sampler_type,
        "mgat_masks": list(cfg.mgat_masks),
        "metrics": metrics,
        "reference": reference,
        "delta": {k: metrics[k] - reference[k]
                  for k in (reference or {})
                  if k in metrics and metrics[k] == metrics[k]},
        "notes": notes,
    }
    write_report(args.out, payload)
    print(f"report -> {args.out}.json / {args.out}.md")
    return payload


if __name__ == "__main__":
    main()
