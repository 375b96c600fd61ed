#!/usr/bin/env python
"""Convert a reference PyTorch ISubGVQA checkpoint to this framework.

    python tools/convert_checkpoint.py <ref_checkpoint.pth> <out_dir>

Reads the torch ``.pth`` (CPU), maps ``model.state_dict()`` onto the
flax parameter/batch-stats trees (see isubgvqa_tpu/convert.py for the
name correspondence), and writes an orbax checkpoint plus a config
meta JSON derived from the checkpointed args.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    src, out_dir = sys.argv[1], sys.argv[2]

    import torch

    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.convert import convert_state_dict, strip_ddp_prefix

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in strip_ddp_prefix(ckpt["model"]).items()
          if hasattr(v, "numpy")}
    args = ckpt.get("args")
    mgat_layers = getattr(args, "mgat_layers", 4)
    params, stats = convert_state_dict(sd, mgat_layers=mgat_layers)

    cfg_kwargs = {}
    for name in ("mgat_layers", "sampler_type", "sample_k", "nb_samples",
                 "alpha", "beta", "tau", "use_topk", "interpretable_mode",
                 "concat_instr", "use_all_instrs", "use_global_mask",
                 "text_sampling", "general_hidden_dim"):
        if args is not None and hasattr(args, name):
            cfg_kwargs[name] = getattr(args, name)
    if "mgat_masks" in dir(args or object()):
        cfg_kwargs["mgat_masks"] = tuple(args.mgat_masks)
    cfg = Config(**{k: v for k, v in cfg_kwargs.items() if v is not None})

    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(out_dir, {"params": params, "batch_stats": stats}, force=True)
    ckpter.wait_until_finished()
    with open(out_dir + ".meta.json", "w") as f:
        json.dump({"epoch": ckpt.get("epoch", -1),
                   "config": json.loads(cfg.to_json())}, f)
    n = sum(int(v.size) for v in jax_tree_leaves(params))
    print(f"converted {len(sd)} tensors -> {out_dir} ({n} params)")


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
