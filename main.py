#!/usr/bin/env python
"""Training entry point — TPU-native equivalent of the reference's
``main.py``.  Example:

    python main.py --synthetic --sampler_type gumbel --sample_k 3 \
        --batch-size 64 --epochs 2
"""

from isubgvqa_tpu.cli import main

if __name__ == "__main__":
    main()
