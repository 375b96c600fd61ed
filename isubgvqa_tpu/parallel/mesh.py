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


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a multistep super-batch ``[K, B, ...]`` on its *second*
    (batch) axis over ``data``; the step axis K stays whole — it is the
    ``lax.scan`` length of the multi-step train program."""
    return NamedSharding(mesh, P(None, "data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a GraphBatch onto the mesh, data-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def put_batch(batch, sharding: NamedSharding):
    """Place a per-host batch onto a (possibly multi-process) mesh.

    Single-process: plain ``jax.device_put``.  Multi-process: each host
    holds a *different* slice of the global batch (the lock-step
    bucketed schedule gives host ``i`` the round's ``i``-th chunk,
    DistributedSampler parity), and ``jax.device_put`` refuses
    per-host-different data on a cross-process sharding — the global
    array is assembled with
    ``jax.make_array_from_process_local_data`` instead, so the global
    batch is ``process_count * batch_size`` exactly like DDP's
    per-rank batch size (``run_training_ddp.sh:23-31``).  Pinned by
    ``tests/test_multiprocess.py``."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# --------------------------------------------------------------- tensor
# parallelism over the ``model`` axis (optional; absent in the
# reference — SURVEY §2.2 marks TP n/a — but the axis is functional,
# not just reserved).  GSPMD style: the rules below only choose the
# *placement* of the big parameter tables; the step function is
# untouched and XLA's partitioner inserts the collectives.  The two
# tables dominate parameter/optimizer memory (CLIP text embedding
# 49408x512 ≈ 25M of the ~63M params; answer head 512x1842): row-shard
# them over ``model``.  Everything else (and every leaf whose shape
# doesn't divide) stays replicated, so ``shard_state`` degenerates to
# ``replicate`` on a model=1 mesh.
#
# Rules match on the tail of the tree path, so they apply equally to
# ``params`` and to the optimizer's mirrored moments (Adam mu/nu).
TP_PARAM_RULES = (
    (("token_embedding", "embedding"), P("model", None)),  # [V, D]
    (("logit_fc", "kernel"), P("model", None)),            # [D, answers]
)


def _path_names(path) -> tuple:
    names = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                names.append(str(getattr(k, attr)))
                break
        else:
            names.append(str(k))
    return tuple(names)


def tp_spec(path, leaf, mesh: Mesh) -> P:
    """PartitionSpec for one state leaf under the TP rules (replicated
    unless a rule matches and every sharded dim divides the axis)."""
    if mesh.shape.get("model", 1) <= 1:
        return P()
    names = _path_names(path)
    shape = getattr(leaf, "shape", ())
    for suffix, spec in TP_PARAM_RULES:
        if names[-len(suffix):] != suffix or len(shape) != len(spec):
            continue
        if all(ax is None or shape[d] % mesh.shape[ax] == 0
               for d, ax in enumerate(spec)):
            return spec
    return P()


def shard_state(tree, mesh: Mesh):
    """Place a train state (or params pytree) onto the mesh: TP rules
    for the big tables, replicated otherwise."""
    def place(path, x):
        return jax.device_put(x, NamedSharding(mesh, tp_spec(path, x, mesh)))
    return jax.tree_util.tree_map_with_path(place, tree)
