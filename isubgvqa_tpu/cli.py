"""Command-line training entry.

Mirrors the reference CLI surface (``main.py:183-194`` +
``utils/arg_parser.py:4-137``): the same flags map onto
:class:`~isubgvqa_tpu.config.Config`, seeds, scales batch/lr by
``--scale_factor``, builds data/model/optimizer, optionally resumes,
and runs the train loop.  Distributed flags are replaced by the mesh
(SPMD needs no launcher plumbing).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import pathlib

from .config import Config


def get_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ISubGVQA-TPU", add_help=False)
    d = Config()
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--mgat_layers", default=d.mgat_layers, type=int)
    p.add_argument("--log-name", default=d.log_name, type=str)
    p.add_argument("--epochs", default=d.epochs, type=int)
    p.add_argument("--start-epoch", default=d.start_epoch, type=int)
    p.add_argument("--nb_samples", default=d.nb_samples, type=int)
    p.add_argument("--alpha", default=d.alpha, type=float)
    p.add_argument("--beta", default=d.beta, type=float)
    p.add_argument("--tau", default=d.tau, type=float)
    p.add_argument("--batch-size", default=d.batch_size, type=int)
    p.add_argument("--lr", "--learning-rate", default=d.lr, type=float,
                   dest="lr")
    p.add_argument("--scale_factor", default=d.scale_factor, type=int)
    p.add_argument("-p", "--print-freq", default=d.print_freq, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--pre_eval", action="store_true")
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--output_dir", default=d.output_dir)
    p.add_argument("--use_instruction", type=int, default=1)
    p.add_argument("--use_masking", type=int, default=1)
    p.add_argument("--mgat_masks", nargs="+", type=float,
                   default=list(d.mgat_masks))
    p.add_argument("--use_topk", type=int, default=1)
    p.add_argument("--interpretable_mode", type=int, default=0)
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--concat_instr", type=int, default=0)
    p.add_argument("--general_hidden_dim", type=int, default=d.general_hidden_dim)
    p.add_argument("--use_all_instrs", action="store_true")
    p.add_argument("--use_global_mask", action="store_true")
    p.add_argument("--text_sampling", action="store_true")
    p.add_argument("--sampler_type", type=str, default=None)
    p.add_argument("--sample_k", type=int, default=None)
    p.add_argument("--node_classification", action="store_true")
    # flags the reference parses but never uses in its live path
    # (arg_parser.py:33-46,91,94,103-106,110,118-135) — accepted for
    # invocation compatibility, ignored like the reference ignores them
    p.add_argument("--lr_drop", default=30, type=int)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", "--weight-decay", default=1e-4, type=float,
                   dest="weight_decay")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--evaluate_sets", default=["val_unbiased", "testdev"],
                   nargs="+")
    p.add_argument("--work_dir", default="./outputdir")
    p.add_argument("--gnn_gating", type=int, default=1)
    p.add_argument("--use_mgat", type=int, default=0)
    p.add_argument("--embed_cat", type=int, default=0)
    p.add_argument("--use_subgat", action="store_true")
    p.add_argument("--bi_qa", action="store_true")
    p.add_argument("--mask_regularization", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="no-op: SPMD needs no launcher plumbing")
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--launcher", choices=["none", "pytorch", "slurm", "mpi"],
                   default="none")
    p.add_argument("--gpus", type=int, default=None)
    p.add_argument("--gpu-ids", type=int, nargs="+", default=None)
    # data / TPU-native extensions
    p.add_argument("--data_dir", default=d.data_dir)
    p.add_argument("--meta_dir", default=d.meta_dir)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=d.synthetic_size)
    p.add_argument("--synthetic_shape_mix", type=str,
                   default=d.synthetic_shape_mix, choices=["small", "gqa"])
    p.add_argument("--compute_dtype", default=d.compute_dtype)
    p.add_argument("--num_data_shards", type=int, default=None)
    p.add_argument("--model_parallel", type=int, default=d.model_parallel,
                   help="mesh devices along the model axis (>1 shards "
                        "the big embedding/head tables; TP)")
    p.add_argument("--question_len", type=int, default=d.question_len)
    p.add_argument("--clip_weights", default=d.clip_weights,
                   help="pretrained CLIP text token/position tables "
                        "(.npz/.safetensors/.pth) copied into the "
                        "question encoder at init, mirroring the "
                        "reference's CLIPModel deep-copy "
                        "(isubgvqa.py:119-121)")
    p.add_argument("--num_answers", type=int, default=d.num_answers)
    p.add_argument("--profile_dir", default=d.profile_dir,
                   help="capture a jax.profiler trace of fit() here and "
                        "log per-epoch step-time summaries")
    p.add_argument("--multistep", type=int, default=d.multistep,
                   help="optimizer updates per device dispatch: stacks "
                        "K same-bucket batches into one lax.scan "
                        "program (trajectory-identical; amortizes host "
                        "dispatch overhead)")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    base = Config()
    if args.config and os.path.isfile(args.config):
        with open(args.config) as f:
            base = Config.from_json(f.read())
    fields = {f.name for f in dataclasses.fields(Config)}
    overrides = {k: v for k, v in vars(args).items()
                 if k in fields and v is not None}
    for flag in ("use_instruction", "use_masking", "use_topk",
                 "interpretable_mode", "concat_instr"):
        if flag in overrides:
            overrides[flag] = bool(overrides[flag])
    if "mgat_masks" in overrides:
        overrides["mgat_masks"] = tuple(overrides["mgat_masks"])
    if "start_epoch" not in overrides and hasattr(args, "start_epoch"):
        overrides["start_epoch"] = args.start_epoch
    return dataclasses.replace(base, **overrides)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        "Intrinsic Subgraph Generation for Graph based VQA (TPU)",
        parents=[get_argparser()])
    args = parser.parse_args(argv)
    cfg = config_from_args(args).scaled()     # main.py:54-55

    if cfg.output_dir:
        pathlib.Path(cfg.output_dir).mkdir(parents=True, exist_ok=True)

    from .parallel.mesh import init_multihost, is_main_process
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    init_multihost()
    if cfg.output_dir and is_main_process():   # main.py:60-66
        logging.basicConfig(
            filename=os.path.join(cfg.output_dir, cfg.log_name),
            filemode="w",
            format="%(asctime)s: %(levelname)s: [%(filename)s:%(lineno)d]: %(message)s",
            level=logging.INFO,
        )
        logging.info(str(cfg))

    import jax

    print(f"jax version: {jax.__version__}")
    print(f"devices: {jax.devices()}")
    print(f"scaled batch size of {cfg.batch_size}")
    print(f"scaled learning rate of {cfg.lr}")

    from .data.build import build_datasets
    from .models.build import build_model
    from .train.loop import Trainer

    # the reference replaces args wholesale from the checkpoint on
    # resume (main.py:128-137) — adopt the checkpointed config up
    # front so the rebuilt model/data match the restored state
    if cfg.resume:
        resume_path = cfg.resume if os.path.exists(cfg.resume) else \
            os.path.join(cfg.output_dir, cfg.resume)
        meta_path = resume_path + ".meta.json"
        if os.path.isfile(meta_path):
            import json as _json

            with open(meta_path) as f:
                ckpt_cfg = Config.from_json(_json.dumps(_json.load(f)["config"]))
            cfg = dataclasses.replace(
                ckpt_cfg, resume=resume_path, evaluate=cfg.evaluate,
                pre_eval=cfg.pre_eval, output_dir=cfg.output_dir,
                epochs=cfg.epochs)

    data = build_datasets(cfg)
    # classifier width must match the answer map actually loaded
    # (1842 with the GQA meta assets; isubgvqa.py:207)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab, bn_axis_name=None)

    trainer = Trainer(cfg, model, data)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        jax.device_get(trainer.state.params)))
    print("number of params:", n_params)

    if cfg.resume:
        if os.path.exists(os.path.join(cfg.output_dir, cfg.resume)) or \
                os.path.exists(cfg.resume):
            start_epoch, ckpt_cfg = trainer.resume(
                cfg.resume, model_only=cfg.evaluate)   # main.py:131
            if not cfg.evaluate:
                cfg = dataclasses.replace(cfg, start_epoch=start_epoch)
                trainer.cfg = cfg
            print(f"=> loaded checkpoint '{cfg.resume}' (epoch {start_epoch - 1})")
        else:
            print(f"=> no checkpoint found at '{cfg.resume}'")

    trainer.fit()


if __name__ == "__main__":
    main()
