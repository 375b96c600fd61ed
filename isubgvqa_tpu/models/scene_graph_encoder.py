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

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.pallas import gat_train
from ..ops.pallas.metalayer_kernel import fused_metalayer, metalayer_reference
from ..ops.pallas.metalayer_train import fused_metalayer_train
from ..utils.platform import on_tpu_backend as _on_tpu
from .layers import MaskedBatchNorm

_lecun = nn.initializers.lecun_normal()
_zeros = nn.initializers.zeros


class SceneGraphEncoder(nn.Module):
    sg_vocab_size: int
    hidden_dim: int = 300
    sg_emb_dim: int = 300
    vocab_vectors: Optional[np.ndarray] = None   # GloVe init (host numpy)
    bn_axis_name: Optional[str] = None           # set for SyncBatchNorm parity
    use_pallas: bool = True
    # graphs per fused-MetaLayer grid program ("auto"/int/None), same
    # semantics as the GAT kernels' knob (cfg.kernel_pack)
    pack: Union[int, str, None] = None
    dtype: Optional[jnp.dtype] = None

    def _meta_params(self):
        c = self.hidden_dim
        p = lambda name, shape, init=_lecun: self.param(name, init, shape)
        return {
            "ew1": p("edge_mlp_w1", (3 * c, c)), "eb1": p("edge_mlp_b1", (c,), _zeros),
            "ew2": p("edge_mlp_w2", (c, c)), "eb2": p("edge_mlp_b2", (c,), _zeros),
            "n1w1": p("node_mlp1_w1", (2 * c, c)), "n1b1": p("node_mlp1_b1", (c,), _zeros),
            "n1w2": p("node_mlp1_w2", (c, c)), "n1b2": p("node_mlp1_b2", (c,), _zeros),
            "n2w1": p("node_mlp2_w1", (2 * c, c)), "n2b1": p("node_mlp2_b1", (c,), _zeros),
            "n2w2": p("node_mlp2_w2", (c, c)), "n2b2": p("node_mlp2_b2", (c,), _zeros),
            "gn_w": p("gn_weight", (c,), nn.initializers.ones),
            "gn_b": p("gn_bias", (c,), _zeros),
            "gn_a": p("gn_mean_scale", (c,), nn.initializers.ones),
        }

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic=True,
                 expl_x_embed_sum=None):
        """-> (x_encoded [B, N, 300], edge_attr_encoded [B, E, 300]).

        ``expl_x_embed_sum`` is the external-explainer bypass
        (``scene_graph_encoder.py:64-74``, explainer stage 0): when
        given, it replaces the vocab-embedding token-sum — the bbox
        branch, reduction, and MetaLayer still run on top of it.
        """
        use_vectors = (self.vocab_vectors is not None
                       and self.vocab_vectors.shape[1] == self.sg_emb_dim)
        if use_vectors:
            init = lambda *_: jnp.asarray(self.vocab_vectors, jnp.float32)
        else:
            # vocab vectors (GloVe, 300-d) only apply at the matching
            # embedding width; a non-default --general_hidden_dim falls
            # back to seeded random init
            init = nn.initializers.normal(1.0)
        embed = nn.Embed(self.sg_vocab_size, self.sg_emb_dim,
                         embedding_init=init, dtype=self.dtype,
                         name="sg_vocab_embedding")

        node_mask = batch.node_mask              # [B, N]
        use_ra = deterministic

        # ---- node features: token-sum ⊕ bbox MLP -> reduc (:63-74)
        if expl_x_embed_sum is not None:
            x_sum = jnp.asarray(expl_x_embed_sum)             # [B, N, 300]
        else:
            x_sum = jnp.sum(embed(batch.node_tokens), axis=-2)  # [B, N, 300]

        bb = batch.node_bbox.astype(x_sum.dtype)
        bb = MaskedBatchNorm(4, axis_name=self.bn_axis_name, name="bbox_bn0")(
            bb, mask=node_mask, use_running_average=use_ra)
        bb = nn.gelu(nn.Dense(16, dtype=self.dtype, name="bbox_lin0")(bb),
                     approximate=False)
        bb = MaskedBatchNorm(16, axis_name=self.bn_axis_name, name="bbox_bn1")(
            bb, mask=node_mask, use_running_average=use_ra)
        bb = nn.gelu(nn.Dense(32, dtype=self.dtype, name="bbox_lin1")(bb),
                     approximate=False)

        x = jnp.concatenate([x_sum, bb], axis=-1)             # [B, N, 332]
        x = MaskedBatchNorm(self.sg_emb_dim + 32, axis_name=self.bn_axis_name,
                            name="reduc_bn")(x, mask=node_mask,
                                             use_running_average=use_ra)
        x = nn.gelu(nn.Dense(self.sg_emb_dim, dtype=self.dtype,
                             name="reduc_lin")(x), approximate=False)

        # ---- edge features; negate added symmetric edges (:76-80)
        e = embed(batch.edge_token) * batch.edge_sign[..., None].astype(x.dtype)

        # ---- MetaLayer round + GraphNorm (:99-146), fused on TPU:
        # inference uses the forward-only kernel; training the
        # custom-VJP pair (ops/pallas/metalayer_train.py) whose Pallas
        # backward keeps the per-edge MLP activations out of HBM
        params = self._meta_params()
        on_tpu = _on_tpu()   # module-local seam (utils/platform.py)
        if self.use_pallas and deterministic and on_tpu:
            fn = functools.partial(fused_metalayer, pack=self.pack)
        elif self.use_pallas and not deterministic \
                and (on_tpu or gat_train.FORCE_INTERPRET):
            fn = functools.partial(fused_metalayer_train,
                                   interpret=gat_train.FORCE_INTERPRET,
                                   pack=self.pack)
        else:
            fn = metalayer_reference
        x_out, e_out = fn(x, e, batch.edge_src, batch.edge_dst,
                          batch.edge_mask, batch.node_mask, params)
        return x_out, e_out
