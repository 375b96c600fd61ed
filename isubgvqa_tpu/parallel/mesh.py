"""Mesh construction and batch sharding.

Design (scaling-book recipe): pick a mesh, annotate shardings on the
step's inputs, let XLA insert the collectives.

* Every :class:`~isubgvqa_tpu.data.batching.GraphBatch` leaf has a
  leading axis divisible by the batch size (flat node/edge arrays are
  ``B * budget`` long, question/label arrays are ``B`` long), so the
  whole batch shards on axis 0 over the ``data`` mesh axis.
* Parameters/optimizer state are replicated (the model is ~30M params;
  DP is the right parallelism — SURVEY §2.2).  The reserved ``model``
  axis makes the layout forward-compatible with TP.
* Gradient all-reduce, metric reduction, and SyncBatchNorm statistics
  all fall out of XLA's partitioner — there is no DDP wrapper, no
  explicit barrier (program order is the barrier), no NCCL.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost() -> None:
    """Multi-process initialization (torch ``init_process_group``
    equivalent, ``main.py:72-75``).  No-op in single-process runs."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def is_main_process() -> bool:
    """``utils/misc.py:380-382`` equivalent."""
    return jax.process_index() == 0


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """1-D (or 2-D with a model axis) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = num_data or (len(devices) // num_model)
    dev_array = mesh_utils.create_device_mesh(
        (n, num_model), devices=devices[: n * num_model]
    )
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard any batch leaf on its leading axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a GraphBatch onto the mesh, data-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
