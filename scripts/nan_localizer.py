#!/usr/bin/env python
"""Localize nonfinite values in the training forward/backward.

Loads a checkpoint (e.g. the convergence run's rolling checkpoint),
replays training batches until one produces a nonfinite loss or
gradient, then re-runs that batch with ``capture_intermediates=True``
and reports the first nonfinite intermediate along the module tree —
the round-5 tool for chasing the on-TPU gumbel NaNs.

    python scripts/nan_localizer.py \
        --ckpt outputdir/trainrun_r05/gumbel/checkpoint [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed_epoch", type=int, default=None,
                   help="replay only this epoch's shuffle seed")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data.batching import iterate_batches_bucketed
    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.models.build import build_model
    from isubgvqa_tpu.train.loop import Trainer
    from isubgvqa_tpu.train.steps import cross_entropy_loss

    meta_path = args.ckpt + ".meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = Config.from_json(json.dumps(meta["config"]))
    epoch = int(meta.get("epoch", 0))
    print(f"config: sampler={cfg.sampler_type} epoch={epoch} "
          f"bs={cfg.batch_size}", flush=True)

    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)
    start_epoch, _ = trainer.resume(os.path.abspath(args.ckpt))
    state = trainer.state
    print(f"restored epoch {start_epoch - 1}", flush=True)

    # params/opt-state health first
    for name, tree in [("params", state.params),
                       ("batch_stats", state.batch_stats),
                       ("opt_state", state.opt_state)]:
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            arr = np.asarray(jax.device_get(leaf))
            if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
                bad.append(jax.tree_util.keystr(path))
        print(f"{name}: {'NONFINITE in ' + str(bad[:10]) if bad else 'finite'}",
              flush=True)

    def loss_and_grad(params, batch, rngs):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch, train=True, aimle_states=state.aimle_states,
                rngs=rngs, mutable=["batch_stats"])
            return cross_entropy_loss(out.logits, batch.labels,
                                      batch.sample_mask)
        return jax.value_and_grad(loss_fn)(params)

    lg = jax.jit(loss_and_grad)

    rng = jax.random.PRNGKey(cfg.seed)
    epochs = ([args.seed_epoch] if args.seed_epoch is not None
              else [max(start_epoch - 1, 0), start_epoch])
    steps = 0
    offender = None
    for ep in epochs:
        it = iterate_batches_bucketed(
            data.datasets["train"], data.bucket_collators["train"],
            shuffle=True, seed=cfg.seed + ep, drop_last=True)
        for batch, bmeta in it:
            drng, srng = jax.random.split(
                jax.random.fold_in(rng, int(state.step) + steps))
            loss, grads = jax.device_get(lg(
                state.params, batch, {"dropout": drng, "sampler": srng}))
            gn = float(np.sqrt(sum(
                float(np.sum(np.square(np.asarray(g, np.float64))))
                for g in jax.tree_util.tree_leaves(grads))))
            ok_loss = np.isfinite(loss)
            ok_g = np.isfinite(gn)
            print(f"ep {ep} step {steps}: loss={float(loss):.4f} "
                  f"gnorm={gn:.3e} finite={ok_loss and ok_g}", flush=True)
            steps += 1
            if not (ok_loss and ok_g):
                offender = (batch, {"dropout": drng, "sampler": srng},
                            not ok_loss)
                break
            if steps >= args.max_steps:
                break
        if offender or steps >= args.max_steps:
            break

    if offender is None:
        print("no nonfinite step found", flush=True)
        return

    batch, rngs, fwd_nan = offender
    print(f"offender found (forward nan={bool(fwd_nan)}); "
          "capturing intermediates...", flush=True)
    out, mods = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=True, aimle_states=state.aimle_states,
        rngs=rngs, mutable=["batch_stats", "intermediates"],
        capture_intermediates=True)
    inter = mods["intermediates"]
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append((jax.tree_util.keystr(path),
                        float(np.mean(~np.isfinite(arr)))))
    if bad:
        print("first nonfinite intermediates (module call order):")
        for k, frac in bad[:20]:
            print(f"  {k}: {frac:.4f} nonfinite", flush=True)
    else:
        print("forward intermediates all finite (backward-only nan); "
              "logits finite:",
              bool(np.all(np.isfinite(np.asarray(out.logits)))), flush=True)


if __name__ == "__main__":
    main()
