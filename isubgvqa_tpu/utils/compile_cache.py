"""Persistent XLA compilation cache.

Full-model compiles through the sandbox TPU tunnel take 3-15 minutes
and the reference workload re-runs the same executables constantly
(one jit specialization per size bucket; every CLI invocation, bench
run, serving process and explain run recompiles them from scratch).
JAX's persistent compilation cache serializes compiled executables to
disk keyed by (HLO, compile options, backend); a warm cache turns a
10-minute compile into sub-second deserialization — measured 7.0 s ->
0.33 s on a toy program and minutes -> seconds on the bucketed model
through the axon tunnel.  Pallas/Mosaic kernels serialize fine (they
are custom-call payloads inside the HLO).

Every entry point calls :func:`enable_compilation_cache` once at
startup.  Control via ``ISUBGVQA_COMPILE_CACHE``:

- unset        -> enabled at ``~/.cache/isubgvqa_tpu/xla``
- ``0``/``off`` -> disabled
- a path       -> enabled there

The reference has no equivalent (torch.compile caches per-process
only); this is TPU-native operational parity with eager CUDA startup.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "isubgvqa_tpu", "xla")

_enabled: str | None = None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or ``None`` when disabled
    (``ISUBGVQA_COMPILE_CACHE=0``) or unsupported by the installed jax.
    """
    global _enabled
    env = os.environ.get("ISUBGVQA_COMPILE_CACHE", "").strip()
    if env.lower() in ("0", "off", "false", "no"):
        return None
    if cache_dir is None:
        cache_dir = env if env else _DEFAULT_DIR
    if _enabled is not None:
        return _enabled
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Through the tunnel even medium compiles are worth
        # persisting, so the compile-time floor drops to 1 s — but a
        # size floor keeps host-side utility jits (threefry, take,
        # reduce, ... on the secondary CPU backend; a few KB each) out
        # of the cache: XLA:CPU reloads deserialize as AOT results and
        # log a spurious machine-feature-mismatch error per load,
        # flooding CLI logs.  Real model executables are MBs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          256 * 1024)
    except Exception:          # old jax without the knobs: run uncached
        return None
    _enabled = cache_dir
    return cache_dir
