"""ISubGVQA-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
intrinsic-subgraph-generation visual question answering.

This is a ground-up TPU-first rebuild of the capabilities of
``DigitalPhonetics/Intrinsic-Subgraph-Generation-for-VQA`` (ISubGVQA):
an interpretable graph-based VQA system for GQA where a question steers
masked GATv2 message passing over a scene graph, and differentiable
top-k samplers (IMLE / AIMLE / SIMPLE / Gumbel) select an explicit,
small explanatory subgraph.

Architecture differences from the PyTorch/PyG reference (by design):

* Graph mini-batches are **padded, fixed-shape segment arrays** (see
  :mod:`isubgvqa_tpu.data.batching`) instead of dynamic COO concats, so
  every step compiles once under ``jax.jit``.
* All scatter/gather graph ops are **segment reductions**
  (:mod:`isubgvqa_tpu.ops`) mapped onto XLA, with Pallas kernels for the
  hot fused paths (:mod:`isubgvqa_tpu.ops.pallas`).
* The discrete samplers are pure, jit-safe functions with
  ``jax.custom_vjp`` gradients (:mod:`isubgvqa_tpu.sampling`); AIMLE's
  adaptive state is explicit and threaded through the train step.
* Data parallelism is SPMD over a ``jax.sharding.Mesh`` — no DDP
  wrapper, no NCCL; XLA inserts the collectives.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
