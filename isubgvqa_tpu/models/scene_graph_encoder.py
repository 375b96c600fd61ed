"""Scene-graph encoder: GloVe node/edge embeddings + bbox MLP +
MetaLayer-style edge/node message round + GraphNorm, on the dense
per-graph layout.

Equivalent of ``SceneGraphEncoder``
(``models/scene_graph_encoder.py:8-146``):

* node feature = sum of the 4 token embeddings
  (``scene_graph_encoder.py:63-69``) concat bbox MLP (BatchNorm ->
  4->16->32 with GELUs, ``:35-42``), reduced 332 -> 300 (``:43-51``);
* edge embedding rows of added symmetric edges are negated — the
  in-place ``*= -1`` at ``:80`` becomes a multiply by the batch's
  per-edge sign channel;
* one MetaLayer round (``:107-146``): EdgeModel MLP on
  ``[src, dst, edge]``, NodeModel mean-aggregates transformed incoming
  messages (scatter_mean at ``:141`` -> one-hot matmul + degree
  division) then re-embeds;
* GraphNorm on the node output (``:99-102``; fp32 here instead of the
  reference's fp64 upcast — see layers.GraphNorm).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.dense_graph import aggregate_edges, edge_onehot, gather_nodes
from .layers import MLP, GraphNorm, MaskedBatchNorm


class SceneGraphEncoder(nn.Module):
    sg_vocab_size: int
    hidden_dim: int = 300
    sg_emb_dim: int = 300
    vocab_vectors: Optional[np.ndarray] = None   # GloVe init (host numpy)
    bn_axis_name: Optional[str] = None           # set for SyncBatchNorm parity
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic=True):
        """-> (x_encoded [B, N, 300], edge_attr_encoded [B, E, 300])."""
        if self.vocab_vectors is not None:
            init = lambda *_: jnp.asarray(self.vocab_vectors, jnp.float32)
        else:
            init = nn.initializers.normal(1.0)
        embed = nn.Embed(self.sg_vocab_size, self.sg_emb_dim,
                         embedding_init=init, dtype=self.dtype,
                         name="sg_vocab_embedding")

        node_mask = batch.node_mask              # [B, N]
        use_ra = deterministic

        # ---- node features: token-sum ⊕ bbox MLP -> reduc (:63-74)
        x_sum = jnp.sum(embed(batch.node_tokens), axis=-2)    # [B, N, 300]

        bb = batch.node_bbox.astype(x_sum.dtype)
        bb = MaskedBatchNorm(4, axis_name=self.bn_axis_name, name="bbox_bn0")(
            bb, mask=node_mask, use_running_average=use_ra)
        bb = nn.gelu(nn.Dense(16, dtype=self.dtype, name="bbox_lin0")(bb))
        bb = MaskedBatchNorm(16, axis_name=self.bn_axis_name, name="bbox_bn1")(
            bb, mask=node_mask, use_running_average=use_ra)
        bb = nn.gelu(nn.Dense(32, dtype=self.dtype, name="bbox_lin1")(bb))

        x = jnp.concatenate([x_sum, bb], axis=-1)             # [B, N, 332]
        x = MaskedBatchNorm(self.sg_emb_dim + 32, axis_name=self.bn_axis_name,
                            name="reduc_bn")(x, mask=node_mask,
                                             use_running_average=use_ra)
        x = nn.gelu(nn.Dense(self.sg_emb_dim, dtype=self.dtype,
                             name="reduc_lin")(x))

        # ---- edge features; negate added symmetric edges (:76-80)
        e = embed(batch.edge_token) * batch.edge_sign[..., None].astype(x.dtype)

        # ---- MetaLayer round (:107-146)
        x_src = gather_nodes(x, batch.edge_src)               # [B, E, 300]
        x_dst = gather_nodes(x, batch.edge_dst)
        edge_in = jnp.concatenate([x_src, x_dst, e], axis=-1)  # [B, E, 900]
        e_out = MLP((self.hidden_dim, self.hidden_dim), gelu_last=False,
                    dtype=self.dtype, name="edge_mlp")(edge_in)

        msg = jnp.concatenate([x_src, e_out], axis=-1)        # [B, E, 600]
        msg = MLP((self.hidden_dim, self.hidden_dim), gelu_last=False,
                  dtype=self.dtype, name="node_mlp_1")(msg)
        oh_dst = edge_onehot(batch.edge_dst, x.shape[1], batch.edge_mask,
                             dtype=msg.dtype)
        agg_sum = aggregate_edges(msg, oh_dst)                # [B, N, 300]
        degree = jnp.maximum(jnp.sum(oh_dst, axis=1), 1.0)    # [B, N]
        agg = agg_sum / degree[..., None].astype(agg_sum.dtype)

        x_out = jnp.concatenate([x, agg], axis=-1)
        x_out = MLP((self.hidden_dim, self.hidden_dim), gelu_last=False,
                    dtype=self.dtype, name="node_mlp_2")(x_out)

        # ---- GraphNorm over each graph's nodes (:99-102)
        x_out = GraphNorm(self.sg_emb_dim, name="graph_layer_norm")(
            x_out, node_mask)

        return x_out, e_out
