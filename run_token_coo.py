#!/usr/bin/env python
"""Explanation-extraction entry — TPU-native equivalent of the
reference's ``run_token_coo.py``: loads a checkpoint, runs the dev set
through the model with masks returned, and reports accuracy,
accuracy-AT, and the token-co-occurrence explanation metrics.

Unlike the reference's batch=1 Python loop (``run_token_coo.py:65-79``)
this runs full padded batches through one jitted forward.

    python run_token_coo.py --ckpt <output_dir>/checkpoint_top_res \
        [--synthetic] [--save_expl --expl_dir ./expl]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser("run_token_coo (TPU)")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint path (e.g. outputdir/checkpoint_top_res)")
    p.add_argument("--split", default="dev", choices=["dev", "testdev"])
    p.add_argument("--save_expl", action="store_true")
    p.add_argument("--save_qst_meta_data", action="store_true")
    p.add_argument("--expl_dir", default="./saved_explanations")
    p.add_argument("--expl_format", default="png", choices=["png", "pdf"],
                   help="rendered subgraph format (reference saves PNG,"
                        " utils/graph_vis.py:60-66)")
    p.add_argument("--run", default="run")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    from isubgvqa_tpu.config import Config

    meta_path = args.ckpt + ".meta.json"
    assert os.path.isfile(meta_path), f"checkpoint meta not found: {meta_path}"
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = Config.from_json(json.dumps(meta["config"]))   # run_token_coo.py:29-45
    if args.synthetic:
        cfg = dataclasses.replace(cfg, synthetic=True)

    import jax

    from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.explain import run_token_coo_exp
    from isubgvqa_tpu.models.build import build_model
    from isubgvqa_tpu.train.checkpoint import CheckpointManager
    from isubgvqa_tpu.train.loop import Trainer

    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)

    trainer = Trainer(cfg, model, data)
    ckpt = CheckpointManager(os.path.dirname(os.path.abspath(args.ckpt)) or ".")
    state, _, _ = ckpt.restore(os.path.abspath(args.ckpt),
                               jax.device_get(trainer.state))
    state = jax.device_put(state, jax.devices()[0])

    run_token_coo_exp(
        model=model, state=state, data=data, cfg=cfg, split=args.split,
        save_expl=args.save_expl, expl_dir=args.expl_dir, run=args.run,
        save_qst_meta_data=args.save_qst_meta_data,
        max_batches=args.max_batches, expl_format=args.expl_format,
    )


if __name__ == "__main__":
    main()
