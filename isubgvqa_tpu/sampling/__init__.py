"""Differentiable discrete top-k subgraph samplers, jit-safe.

TPU-native replacements for the three vendored libraries in the
reference (torch-imle at ``sampling/methods/wrapper.py``,
torch-adaptive-imle at ``sampling/methods/aimle.py``, and PR-MPNN's
SIMPLE at ``sampling/methods/simple*.py``) plus the iterative Gumbel
top-k (``sampling/methods/gumbel_scheme.py``).

All samplers are pure functions over dense per-graph score matrices
``[B, N_max]`` (produced by :func:`isubgvqa_tpu.ops.to_dense_batch`),
return hard 0/1 masks with straight-through / custom-VJP gradients, and
contain no data-dependent Python control flow, so they compile once.
"""

from .topk import topk_mask
from .noise import gumbel_noise, sum_of_gamma_noise
from .gumbel import gumbel_topk_sample, gumbel_validation, GumbelSamplerConfig
from .imle import imle_topk, IMLEConfig
from .aimle import aimle_topk, AIMLEConfig, AIMLEState, init_aimle_state
from .simple import simple_sample, exact_k_marginals, SimpleConfig
from .node_edge import node_mask_to_edge_mask, dense_node_gate_to_edge_gate
from .rewiring import (batch_repeat_edge_index,
                       batched_edge_index_to_batched_adj, masked_softmax,
                       non_merge_coalesce, rewire_global_directed,
                       rewire_global_undirected, weighted_cross_entropy)

__all__ = [
    "topk_mask",
    "gumbel_noise",
    "sum_of_gamma_noise",
    "gumbel_topk_sample",
    "gumbel_validation",
    "GumbelSamplerConfig",
    "imle_topk",
    "IMLEConfig",
    "aimle_topk",
    "AIMLEConfig",
    "AIMLEState",
    "init_aimle_state",
    "simple_sample",
    "exact_k_marginals",
    "SimpleConfig",
    "node_mask_to_edge_mask",
    "dense_node_gate_to_edge_gate",
    "batch_repeat_edge_index",
    "batched_edge_index_to_batched_adj",
    "masked_softmax",
    "non_merge_coalesce",
    "rewire_global_directed",
    "rewire_global_undirected",
    "weighted_cross_entropy",
]
