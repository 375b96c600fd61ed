#!/usr/bin/env python
"""Convert a reference PyTorch ISubGVQA checkpoint to this framework.

    python tools/convert_checkpoint.py <ref_checkpoint.pth> <out_dir>

Reads the torch ``.pth`` (CPU), maps ``model.state_dict()`` onto the
flax parameter/batch-stats trees (see isubgvqa_tpu/convert.py for the
name correspondence), and writes an orbax checkpoint plus a config
meta JSON derived from the checkpointed args.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    src, out_dir = sys.argv[1], sys.argv[2]

    from isubgvqa_tpu.convert import convert_reference_checkpoint

    out_dir, cfg = convert_reference_checkpoint(src, out_dir)
    print(f"converted {src} -> {out_dir} "
          f"(sampler={cfg.sampler_type}, mgat_masks={cfg.mgat_masks})")


if __name__ == "__main__":
    main()
