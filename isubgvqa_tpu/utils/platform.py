"""Backend detection for the fused-kernel gates.

Every module with a TPU-only Pallas fast path (MGAT, the scene-graph
encoder, the question encoder/decoder) imports this predicate under a
module-local name (``from ..utils.platform import on_tpu_backend as
_on_tpu``), so tests can spoof ONE module's gate without flipping the
others (monkeypatching ``jax.default_backend`` itself is global to the
process and would drive every fused path onto a backend that cannot
compile it — see tests/test_gat_kernel.py).
"""

from __future__ import annotations

import jax


def on_tpu_backend() -> bool:
    """True when jitted code will run on a real TPU.

    ``jax.default_device`` pinned to a CPU device overrides the
    backend answer: the test mesh runs with the axon TPU plugin
    registered but execution pinned to CPU, where the fused kernels
    must stay off.
    """
    dd = jax.config.jax_default_device
    pinned_cpu = dd is not None and getattr(dd, "platform", "") == "cpu"
    return jax.default_backend() == "tpu" and not pinned_cpu
