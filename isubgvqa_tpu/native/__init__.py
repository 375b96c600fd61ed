"""Native (C++) host-runtime components, compiled on first use.

The TPU compute path is XLA/Pallas; these are the host-side hot spots
where a Python loop would bottleneck a multi-chip host.  Everything
here degrades softly to the pure-Python implementations (set
``ISUBGVQA_NATIVE=0`` to force that).
"""

from .build import build_and_load, native_disabled
from .collate import PackedGraphStore, load_collate_lib

__all__ = ["build_and_load", "native_disabled", "PackedGraphStore",
           "load_collate_lib"]
