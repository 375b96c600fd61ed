#!/usr/bin/env python
"""Build a full-size reference-format ``.pth`` training checkpoint.

The sandbox has no trained upstream checkpoint; the parity harness
still needs a *reference-shaped* one — the exact ``torch.save`` payload
the reference's train loop writes (``{"model": DDP-prefixed
state_dict, "args": argparse.Namespace, "epoch": int, ...}``,
``/root/reference/ISubGVQA/training/train_loop.py:88-94``) at the full
production dimensions (49408-token CLIP vocab, real scene-graph vocab,
1842 answers, masked conv3 with the sampler head).  The weights are
randomly initialized torch modules — the converter/pipeline surface is
what is under test, not the numbers (``scripts/parity_report.py``).

Reuses the plain-torch transcription of the reference model from the
golden tests (``tests/test_torch_golden_graph.py:TorchRefISubGVQA``),
whose ``state_dict`` carries the reference's parameter names.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

META_DEFAULT = os.environ.get("ISUBGVQA_META_DIR",
                              "/root/reference/ISubGVQA/meta_info")


def main():
    p = argparse.ArgumentParser("make_reference_ckpt")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--meta_dir", default=META_DEFAULT,
                   help="meta assets for the scene-graph vocab size")
    p.add_argument("--text_vocab", type=int, default=49408)
    p.add_argument("--answers", type=int, default=1842)
    p.add_argument("--sampler_type", default="gumbel",
                   choices=["gumbel", "simple", "imle", "aimle"])
    p.add_argument("--sample_k", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import torch

    from isubgvqa_tpu.data.vocab import SceneGraphVocab
    from test_torch_golden_graph import TorchRefISubGVQA, C

    vocab = SceneGraphVocab.build(args.meta_dir)
    torch.manual_seed(args.seed)
    m = TorchRefISubGVQA(args.text_vocab, len(vocab), args.answers)
    # masked conv3's sampler head (reference masking.py:77-87; gate_nn
    # exists in reference checkpoints but is unused by its forward)
    conv3 = m.gat_seq.convs[-1]
    conv3.mask = torch.nn.Module()
    conv3.mask.node_nn = torch.nn.Sequential(
        torch.nn.Linear(C, C), torch.nn.GELU())
    conv3.mask.ques_nn = torch.nn.Sequential(
        torch.nn.Linear(C, C), torch.nn.GELU())
    conv3.mask.gate_nn = torch.nn.Sequential(
        torch.nn.Linear(C, C), torch.nn.GELU(), torch.nn.Linear(C, 1))

    ckpt_args = argparse.Namespace(
        mgat_layers=4, sampler_type=args.sampler_type,
        sample_k=args.sample_k, nb_samples=1, alpha=1.0, beta=10.0,
        tau=1.0, use_topk=True, interpretable_mode=False,
        concat_instr=False, use_all_instrs=False, use_global_mask=False,
        text_sampling=False, general_hidden_dim=C,
        mgat_masks=[1.0, 1.0, 1.0, 0.15], batch_size=256, lr=5e-5,
    )
    payload = {
        "model": {f"module.{k}": v for k, v in m.state_dict().items()},
        "args": ckpt_args,
        "epoch": 0,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(payload, args.out)
    n_params = sum(v.numel() for v in m.state_dict().values())
    print(f"wrote {args.out}: {n_params} reference params "
          f"(sg_vocab={len(vocab)}, answers={args.answers})")


if __name__ == "__main__":
    main()
