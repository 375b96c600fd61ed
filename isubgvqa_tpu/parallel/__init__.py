"""SPMD execution over a device mesh.

Replaces the reference's distributed stack — NCCL process groups
(``main.py:72-94``), ``DistributedDataParallel``,
``DistributedSampler`` (``datasets/build.py:44-49``), explicit barriers
(``train_loop.py:55-82``), and the pickle-based object collectives
(``utils/misc.py:85-154``) — with single-controller JAX: one mesh, data
sharded over the ``data`` axis, parameters replicated, XLA-inserted
collectives over ICI.  A ``model`` axis is reserved for tensor
parallelism should the model grow.
"""

from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    init_multihost,
    is_main_process,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "init_multihost",
    "is_main_process",
]
