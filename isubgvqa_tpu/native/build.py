"""Compile-on-first-use loader for the native (C++) runtime pieces.

The reference ships no first-party native code (SURVEY §2.3) — its
native compute lives in torch_scatter/PyG CUDA kernels and its data
path in torch DataLoader worker processes.  Here the device compute is
XLA/Pallas; the *host* runtime hot spots (the dense-batch collate
fill) are C++ compiled once per source hash with the system toolchain
and loaded through ctypes.

Failure is always soft: no compiler, a failed build, or
``ISUBGVQA_NATIVE=0`` just returns ``None`` and callers keep the pure
NumPy path (which also remains the parity oracle,
tests/test_native_collate.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_BUILD = os.path.join(os.path.dirname(__file__), "_build")


def native_disabled() -> bool:
    return os.environ.get("ISUBGVQA_NATIVE", "1") in ("0", "false", "off")


def build_and_load(name: str) -> Optional[ctypes.CDLL]:
    """Compile ``csrc/<name>.cpp`` (if its hash-named .so is not cached)
    and dlopen it.  Returns None when native is disabled or the build
    fails."""
    if native_disabled():
        return None
    src_path = os.path.join(_CSRC, f"{name}.cpp")
    try:
        with open(src_path, "rb") as f:
            src = f.read()
    except OSError as exc:
        logger.warning("native source %s unreadable: %s", src_path, exc)
        return None
    tag = hashlib.sha1(src).hexdigest()[:16]
    so_path = os.path.join(_BUILD, f"{name}-{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD, exist_ok=True)
        # atomic: build to a temp name, rename into place (concurrent
        # importers race benignly)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD)
        os.close(fd)
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", tmp, src_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError) as exc:
            err = getattr(exc, "stderr", b"") or b""
            logger.warning("native build of %s failed (%s) %s — using the "
                           "pure-Python path", name, exc,
                           err.decode(errors="replace")[:500])
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        return ctypes.CDLL(so_path)
    except OSError as exc:
        logger.warning("dlopen(%s) failed: %s", so_path, exc)
        return None
