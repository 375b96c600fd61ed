"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax initializes its backends, hence the
module-level assignment here (conftest is imported before any test
module).
"""

import os

# The sandbox exports JAX_PLATFORMS=axon (the TPU tunnel) and may
# pre-import jax, so a plain env default is not enough — override both
# the env var and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's in-process collectives CHECK-abort ("Termination timeout
# for `all reduce ...` of 40 seconds exceeded") when the 8 per-device
# computations can't all reach the rendezvous in 40 s — which a full
# sharded train step easily exceeds on a 1-core host.  Raise the
# termination timeout so slow machines time out the *test*, not the
# process (the abort killed the whole suite, misread for two sessions
# as external SIGABRT/contention).
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
os.environ["XLA_FLAGS"] = _flags
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 simulated CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
