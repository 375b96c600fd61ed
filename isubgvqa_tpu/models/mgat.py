"""Masked GATv2 message-passing stack, segment-array formulation.

Equivalent of ``MGAT`` (``models/mgat.py:8-184``) and its
``MaskingGATv2Conv`` (``models/mgat_v2_conv.py:18-285``, a fork of PyG
GATv2).  The PyG ``MessagePassing.propagate`` machinery becomes
explicit gather + segment-softmax + segment-sum over the padded edge
arrays — linear in edges, fused by XLA onto the TPU.

Per layer (``mgat.py:137-177``):

1. instruction fusion ``x = gelu(x * instr[graph])`` or concat
   (``mgat_v2_conv.py:152-157``);
2. if the layer's masking threshold ≠ 1.0: node mask via
   :class:`MaskingModel`, edge mask = mask[src]·mask[dst] with the
   dst-only backward (``mgat_v2_conv.py:159-171``);
3. GATv2 message ``m = x_l[src] + x_r[dst] + lin_edge(e)``; the edge
   mask multiplies **before and after** the leaky ReLU
   (``mgat_v2_conv.py:253-269``); attention
   ``α = softmax_dst((m·att).sum(-1))`` (``:271-272``); aggregation
   ``out[dst] += x_l[src]·α·mask`` (``:277-279``);
4. head projection MLP (``mgat.py:79-89,156``), instruction-conditioned
   per-graph scaled-dot-product reweighting
   (``utils/scatter_scaled_dot_product.py:6-15``), GraphNorm, residual
   (``mgat.py:168-172``), then global/interpretable mask multiply
   (``mgat.py:161-163,174-177``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.segment import segment_softmax, segment_sum
from ..sampling import node_mask_to_edge_mask
from ..sampling.aimle import AIMLEState
from .layers import MLP, GraphNorm
from .masking import MaskingModel

_glorot = nn.initializers.glorot_uniform()


class MaskingGATv2Conv(nn.Module):
    in_channels: int
    out_channels: int
    heads: int = 4
    edge_dim: int = 300
    negative_slope: float = 0.2         # mgat_v2_conv.py:26
    masking_threshold: float = 1.0
    use_instr: bool = True
    use_topk: bool = True
    concat_instr: bool = False
    use_all_instrs: bool = False
    sampler_type: Optional[str] = None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                    # [N_pad, C_in]
        batch: GraphBatch,
        edge_attr: jax.Array,            # [E_pad, edge_dim]
        instruction: jax.Array,          # [B, C_in]
        imle_att: jax.Array,             # [B, dim_q] global language feats
        all_instrs: Optional[jax.Array] = None,   # [B, n_instr, dim_q]
        train: bool = False,
        aimle_state: Optional[AIMLEState] = None,
    ):
        """-> (out [N_pad, H*C], node_mask [N_pad,1] | None, alpha [E_pad, H])."""
        h, c = self.heads, self.out_channels
        g = batch.node_graph_clamped

        if self.use_instr:
            if self.concat_instr:
                x = jnp.concatenate([x, instruction[g]], axis=1)
            else:
                x = nn.gelu(x * instruction[g])        # mgat_v2_conv.py:156-157

        mask = None
        edge_mask_w = None
        if self.masking_threshold != 1.0:              # mgat_v2_conv.py:161
            mask, _ = MaskingModel(
                dim_nodes=x.shape[-1], dim_questions=self.out_channels,
                masking_threshold=self.masking_threshold,
                use_topk=self.use_topk, sampler_type=self.sampler_type,
                sample_k=self.sample_k, nb_samples=self.nb_samples,
                alpha=self.alpha, beta=self.beta, tau=self.tau,
                dtype=self.dtype, name="mask",
            )(x, imle_att[g], batch, train=train, aimle_state=aimle_state,
              use_all_instrs=self.use_all_instrs, all_instrs=all_instrs)
            edge_mask_w = node_mask_to_edge_mask(
                mask, batch.edge_src, batch.edge_dst, x.shape[0])  # [E,1]

        x_l = nn.Dense(h * c, kernel_init=_glorot, dtype=self.dtype,
                       name="lin_l")(x).reshape(-1, h, c)
        x_r = nn.Dense(h * c, kernel_init=_glorot, dtype=self.dtype,
                       name="lin_r")(x).reshape(-1, h, c)
        e = nn.Dense(h * c, use_bias=False, kernel_init=_glorot,
                     dtype=self.dtype, name="lin_edge")(edge_attr)
        e = e.reshape(-1, h, c)

        src, dst = batch.edge_src, batch.edge_dst
        m = x_l[src] + x_r[dst] + e                    # [E, H, C]
        if edge_mask_w is not None:
            m = m * edge_mask_w[:, :, None]
        m = nn.leaky_relu(m, self.negative_slope)
        if edge_mask_w is not None:
            m = m * edge_mask_w[:, :, None]

        att = self.param("att", _glorot, (h, c))
        logits = jnp.sum(m * att[None], axis=-1)       # [E, H]
        alpha = segment_softmax(logits, dst, x.shape[0], mask=batch.edge_mask)

        weight = alpha if edge_mask_w is None else alpha * edge_mask_w
        out = segment_sum(x_l[src] * weight[:, :, None], dst, x.shape[0],
                          mask=batch.edge_mask)
        out = out.reshape(-1, h * c)
        out = out + self.param("bias", nn.initializers.zeros, (h * c,))
        return out, mask, alpha


def scatter_scaled_dot_product_attention(query, key, value, segment_ids,
                                         num_segments, mask=None):
    """Instruction-conditioned per-graph node reweighting
    (``utils/scatter_scaled_dot_product.py:6-15``): softmax over each
    graph's nodes of ``q·k/sqrt(d)``, multiplied onto the values —
    note: a reweighting, not a pooled sum."""
    logits = jnp.sum(query * key, axis=-1) / math.sqrt(query.shape[-1])
    attn = segment_softmax(logits, segment_ids, num_segments, mask=mask)
    return attn[:, None] * value


class MGAT(nn.Module):
    """The 4-layer masked-GAT stack (``mgat.py:8-184``)."""

    channels: int = 300
    num_ins: int = 4
    heads: int = 4
    masking_thresholds: Sequence[float] = (1.0, 1.0, 1.0, 0.15)
    use_instr: bool = True
    use_topk: bool = True
    interpretable_mode: bool = False
    concat_instr: bool = False
    use_all_instrs: bool = False
    use_global_mask: bool = False
    sampler_type: Optional[str] = None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [N_pad, C]
        batch: GraphBatch,
        edge_attr: jax.Array,           # [E_pad, C]
        instr_vectors: jax.Array,       # [B, n_instr, C]
        global_language_feats: jax.Array,  # [B, C]
        train: bool = False,
        aimle_states: Optional[dict] = None,
    ):
        """-> (h, last_mask | None, node_masks list, edge_attns list)."""
        in_ch = self.channels * 2 if self.concat_instr else self.channels
        hcur = x
        mask = None
        node_masks, edge_attns = [], []
        n_seg = batch.num_graphs + 1

        global_mask = None
        if self.use_global_mask:
            global_mask = jnp.ones((hcur.shape[0], 1), hcur.dtype)

        for i in range(self.num_ins):
            ins = instr_vectors[:, i, :]            # [B, C]
            st = (aimle_states or {}).get(i)
            conv_res, m_i, alpha = MaskingGATv2Conv(
                in_channels=in_ch, out_channels=self.channels,
                heads=self.heads, edge_dim=self.channels,
                masking_threshold=float(self.masking_thresholds[i]),
                use_instr=self.use_instr, use_topk=self.use_topk,
                concat_instr=self.concat_instr,
                use_all_instrs=self.use_all_instrs,
                sampler_type=self.sampler_type, sample_k=self.sample_k,
                nb_samples=self.nb_samples, alpha=self.alpha, beta=self.beta,
                tau=self.tau, dtype=self.dtype, name=f"conv{i}",
            )(hcur, batch, edge_attr, ins, global_language_feats,
              all_instrs=instr_vectors, train=train, aimle_state=st)

            # head projection 1200 -> 600 -> 300 (mgat.py:79-89)
            conv_res = MLP((self.channels * self.heads // 2, self.channels),
                           dtype=self.dtype, name=f"x_proj{i}")(conv_res)

            node_masks.append(m_i)
            edge_attns.append(alpha)
            if m_i is not None:
                mask = m_i
            if self.use_global_mask and m_i is not None:
                global_mask = m_i * global_mask      # mgat.py:161-163

            conv_res = scatter_scaled_dot_product_attention(
                ins[batch.node_graph_clamped], conv_res, conv_res,
                batch.node_graph, n_seg, mask=batch.node_mask)
            conv_res = GraphNorm(self.channels, name=f"bn{i}")(
                conv_res, batch.node_graph, n_seg, mask=batch.node_mask)
            hcur = conv_res + hcur                   # mgat.py:171-172

            if self.use_global_mask:
                hcur = global_mask * hcur            # mgat.py:174-175
            elif self.interpretable_mode and m_i is not None:
                hcur = m_i * hcur                    # mgat.py:176-177

        return hcur, mask, node_masks, edge_attns
