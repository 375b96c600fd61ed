"""Question-conditioned global attention graph readout.

Equivalent of ``GlobalAttention`` (``models/att_pooling.py:6-83``):
``gate = softmax_graph((node_nn(x)·ques_nn(u)) / sqrt(d))``,
``out = Σ_graph gate · node_nn(x)``, with the optional node-mask
pre-multiply (``att_pooling.py:63-64``).  The reference's hard-coded
``batch.cuda()`` (``:71,73``) has no equivalent here — segment ids are
device arrays already.

Note the reference defines a ``gate_nn`` MLP that its forward never
uses (``att_pooling.py:34-38`` vs ``:66-68``); it is omitted.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.segment import segment_softmax, segment_sum
from .layers import MLP


class GlobalAttentionPooling(nn.Module):
    num_node_features: int = 300
    num_out_features: int = 300
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [N_pad, F]
        u: jax.Array,                   # [B, C]
        batch: GraphBatch,
        node_mask: Optional[jax.Array] = None,   # [N_pad, 1]
    ):
        """-> (pooled [B, C], gate [N_pad, 1])."""
        c = self.num_out_features
        xn = MLP((c, c), gelu_last=False, dtype=self.dtype, name="node_nn")(x)
        if node_mask is not None:
            xn = xn * node_mask                  # att_pooling.py:63-64
        uq = MLP((c, c), gelu_last=False, dtype=self.dtype, name="ques_nn")(u)
        uq_per_node = uq[batch.node_graph_clamped]

        gate = jnp.sum(xn * uq_per_node, axis=-1, keepdims=True)
        gate = gate / math.sqrt(xn.shape[-1])    # att_pooling.py:66-68
        gate = segment_softmax(gate[:, 0], batch.node_graph,
                               batch.num_graphs + 1,
                               mask=batch.node_mask)[:, None]
        out = segment_sum(gate * xn, batch.node_graph, batch.num_graphs + 1,
                          mask=batch.node_mask)[: batch.num_graphs]
        return out, gate
