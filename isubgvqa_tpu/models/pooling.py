"""Question-conditioned global attention graph readout (dense layout).

Equivalent of ``GlobalAttention`` (``models/att_pooling.py:6-83``):
``gate = softmax_graph((node_nn(x)·ques_nn(u)) / sqrt(d))``,
``out = Σ_graph gate · node_nn(x)``, with the optional node-mask
pre-multiply (``att_pooling.py:63-64``).  The reference's hard-coded
``batch.cuda()`` (``:71,73``) has no equivalent here.

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
from ..ops.dense_graph import node_softmax
from .layers import MLP


class GlobalAttentionPooling(nn.Module):
    num_node_features: int = 300
    num_out_features: int = 300
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [B, N, F]
        u: jax.Array,                   # [B, C]
        batch: GraphBatch,
        node_mask: Optional[jax.Array] = None,   # [B, N, 1]
    ):
        """-> (pooled [B, C], gate [B, N, 1])."""
        c = self.num_out_features
        xn = MLP((c, c), gelu_last=False, dtype=self.dtype, name="node_nn")(x)
        if node_mask is not None:
            xn = xn * node_mask                  # att_pooling.py:63-64
        uq = MLP((c, c), gelu_last=False, dtype=self.dtype, name="ques_nn")(u)

        gate = jnp.einsum("bnd,bd->bn", xn, uq,
                          preferred_element_type=jnp.float32)
        gate = gate / math.sqrt(xn.shape[-1])    # att_pooling.py:66-68
        gate = node_softmax(gate, batch.node_mask)[..., None]
        gate = gate.astype(xn.dtype)
        masked = jnp.where(batch.node_mask[..., None], gate * xn, 0.0)
        out = jnp.sum(masked, axis=1)            # att_pooling.py:73
        return out, gate
