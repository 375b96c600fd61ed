"""Masked GATv2 message-passing stack, dense per-graph formulation.

Equivalent of ``MGAT`` (``models/mgat.py:8-184``) and its
``MaskingGATv2Conv`` (``models/mgat_v2_conv.py:18-285``, a fork of PyG
GATv2).  The PyG ``MessagePassing.propagate`` machinery becomes
batched gathers + one-hot-matmul reductions over the dense
``[B, E_max]`` edge layout — entirely scatter-free, with all
reductions landing on the MXU/VPU.

Per layer (``mgat.py:137-177``):

1. instruction fusion ``x = gelu(x * instr[graph])`` or concat
   (``mgat_v2_conv.py:152-157``);
2. if the layer's masking threshold ≠ 1.0: node mask via
   :class:`MaskingModel`, edge mask = mask[src]·mask[dst]
   (``mgat_v2_conv.py:159-171``);
3. GATv2 message ``m = x_l[src] + x_r[dst] + lin_edge(e)``; the edge
   mask multiplies **before and after** the leaky ReLU
   (``mgat_v2_conv.py:253-269``); attention
   ``α = softmax_dst((m·att).sum(-1))`` (``:271-272``); aggregation
   ``out[dst] += x_l[src]·α·mask`` (``:277-279``);
4. head projection MLP (``mgat.py:79-89,156``), instruction-conditioned
   per-graph SDP reweighting
   (``utils/scatter_scaled_dot_product.py:6-15``), GraphNorm, residual
   (``mgat.py:168-172``), then global/interpretable mask multiply
   (``mgat.py:161-163,174-177``).

Execution paths (identical math, same parameters):

* **fused inference** — one Pallas kernel per layer
  (:func:`isubgvqa_tpu.ops.pallas.fused_gat_layer`); everything above
  stays in VMEM.  Used at inference when ``use_pallas``.
* **fused training** — the edge-space conv as a custom-VJP Pallas
  forward/backward pair plus the XLA node-space head
  (:func:`~isubgvqa_tpu.ops.pallas.gat_train.fused_gat_layer_train`);
  no ``[B, E, H·C]`` tensor touches HBM in either direction.  Used
  when ``use_pallas and train`` on TPU.
* **reference** — the op-by-op XLA formulation
  (:func:`~isubgvqa_tpu.ops.pallas.gat_kernel.gat_layer_reference`),
  fully differentiable (every edge<->node move is an einsum, so the
  backward pass is scatter-free matmuls too).  The fallback and the
  verification path both kernels are gradient-tested against.

TPU-specific restructuring (no semantic change): the four layers'
``lin_edge_i`` weights live stacked under one param
(``lin_edge_all/kernel``); the fused kernel projects the shared
encoded edges against its layer's slice *in VMEM* (the ``[B, E,
4·H·C]`` projection never exists in HBM), and the XLA training path
projects per layer with the same weights.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.pallas import gat_train
from ..ops.pallas.gat_kernel import fused_gat_layer, gat_layer_reference
from ..utils.platform import on_tpu_backend as _on_tpu
from ..sampling.aimle import AIMLEState
from .masking import MaskingModel

_glorot = nn.initializers.glorot_uniform()
_zeros = nn.initializers.zeros
_lecun = nn.initializers.lecun_normal()


class _RawKernel(nn.Module):
    """Bare weight matrix registered at the same param path as an
    ``nn.Dense(name=...)`` (``<name>/kernel``) so existing checkpoints
    and the converter keep working."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _glorot, (self.in_dim, self.out_dim))


class MGATLayer(nn.Module):
    """One masked GATv2 layer owning its raw parameters so the fused
    Pallas kernel and the differentiable XLA path share them."""

    in_channels: int
    out_channels: int
    heads: int = 4
    negative_slope: float = 0.2         # mgat_v2_conv.py:26
    masking_threshold: float = 1.0
    use_instr: bool = True
    use_topk: bool = True
    concat_instr: bool = False
    use_all_instrs: bool = False
    interpretable_mode: bool = False
    sampler_type: Optional[str] = None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0
    use_pallas: bool = True
    # graphs per fused-kernel grid program ("auto" = per-shape
    # heuristic, None = 1), for both the inference kernel and the
    # trainable conv; each kernel clamps the knob to its per-program
    # VMEM caps
    pack: Union[int, str, None] = None
    mask_dropout: float = 0.2           # masking.py:159,196
    dtype: Optional[jnp.dtype] = None

    def _params(self):
        c_in = self.in_channels
        h, c = self.heads, self.out_channels
        hc = h * c
        p_dim = c * h // 2
        att = self.param("att", _glorot, (h, c))
        wl = self.param("lin_l_kernel", _glorot, (c_in, hc))
        bl = self.param("lin_l_bias", _zeros, (hc,))
        wr = self.param("lin_r_kernel", _glorot, (c_in, hc))
        br = self.param("lin_r_bias", _zeros, (hc,))
        cbias = self.param("bias", _zeros, (hc,))
        w1 = self.param("x_proj_w1", _lecun, (hc, p_dim))
        b1 = self.param("x_proj_b1", _zeros, (p_dim,))
        w2 = self.param("x_proj_w2", _lecun, (p_dim, c))
        b2 = self.param("x_proj_b2", _zeros, (c,))
        gn_w = self.param("gn_weight", nn.initializers.ones, (c,))
        gn_b = self.param("gn_bias", _zeros, (c,))
        gn_a = self.param("gn_mean_scale", nn.initializers.ones, (c,))

        # prepack per-head block matrices (constants built from params)
        attb = jnp.zeros((hc, h), jnp.float32)
        expand = jnp.zeros((h, hc), jnp.float32)
        for i in range(h):
            attb = attb.at[i * c:(i + 1) * c, i].set(att[i])
            expand = expand.at[i, i * c:(i + 1) * c].set(1.0)
        return {
            "wl": wl, "bl": bl, "wr": wr, "br": br, "attb": attb,
            "expand": expand, "cbias": cbias, "w1": w1, "b1": b1,
            "w2": w2, "b2": b2, "gn_w": gn_w, "gn_b": gn_b, "gn_a": gn_a,
        }

    @nn.compact
    def __call__(
        self,
        h_in: jax.Array,                 # [B, N, C]
        batch: GraphBatch,
        edge_attr: jax.Array,            # [B, E, C] encoded edge feats
        w_edge: jax.Array,               # [C, H*C] this layer's lin_edge
        instruction: jax.Array,          # [B, C]
        imle_att: jax.Array,             # [B, C] global language feats
        all_instrs: Optional[jax.Array] = None,
        train: bool = False,
        aimle_state: Optional[AIMLEState] = None,
    ):
        """-> (out [B,N,C] incl. residual/sdp/norm, mask | None, alpha)."""
        # fused kernel only when actually lowering for TPU (init may
        # trace under a CPU default_device context); module-local
        # _on_tpu so tests can spoof this gate alone
        on_tpu = _on_tpu()
        run_fused = self.use_pallas and not train and on_tpu
        # training runs the differentiable fused path: Pallas conv with
        # a custom-VJP Pallas backward + the XLA head (ops/pallas/
        # gat_train.py); gradient-exact vs the reference path
        run_fused_train = (self.use_pallas and train
                           and (on_tpu or gat_train.FORCE_INTERPRET))
        # on unmasked fused layers the instruction gating runs inside
        # the kernel — gelu(h*instr) never materializes in HBM; the
        # mask head consumes xf, so masked layers compute it here
        fuse_instr = (run_fused and self.use_instr and not self.concat_instr
                      and self.masking_threshold == 1.0)

        # 1. instruction fusion (mgat_v2_conv.py:152-157)
        if fuse_instr:
            xf = h_in                 # placeholder; kernel computes xf
        elif self.use_instr:
            if self.concat_instr:
                ins_b = jnp.broadcast_to(
                    instruction[:, None, :],
                    h_in.shape[:2] + instruction.shape[-1:])
                xf = jnp.concatenate([h_in, ins_b], axis=-1)
            else:
                xf = nn.gelu(h_in * instruction[:, None, :], approximate=False)
        else:
            xf = h_in

        # 2. node mask via the sampler head (mgat_v2_conv.py:159-171)
        mask = None
        if self.masking_threshold != 1.0:
            mask, _ = MaskingModel(
                dim_nodes=xf.shape[-1], dim_questions=self.out_channels,
                masking_threshold=self.masking_threshold,
                use_topk=self.use_topk, sampler_type=self.sampler_type,
                sample_k=self.sample_k, nb_samples=self.nb_samples,
                alpha=self.alpha, beta=self.beta, tau=self.tau,
                dropout=self.mask_dropout, dtype=self.dtype, name="mask",
            )(xf, imle_att, batch, train=train, aimle_state=aimle_state,
              use_all_instrs=self.use_all_instrs, all_instrs=all_instrs)
            gate = mask
        else:
            gate = jnp.ones(h_in.shape[:2] + (1,), h_in.dtype)

        params = self._params()
        apply_mask = self.interpretable_mode and mask is not None

        if run_fused:
            # lin_edge runs inside the kernel — the [B, E, H*C]
            # projection never materializes in HBM
            out, alpha = fused_gat_layer(
                h=h_in, xf=xf, instr=instruction, gate=gate,
                src=batch.edge_src, dst=batch.edge_dst,
                edge_mask=batch.edge_mask, node_mask=batch.node_mask,
                e_attr=edge_attr, params={**params, "we": w_edge},
                negative_slope=self.negative_slope,
                apply_mask_to_h=apply_mask,
                fuse_instr=fuse_instr,
                pack=self.pack,
            )
        elif run_fused_train:
            out, alpha = gat_train.fused_gat_layer_train(
                h_in, xf, instruction, gate,
                batch.edge_src, batch.edge_dst,
                batch.edge_mask, batch.node_mask,
                edge_attr, {**params, "we": w_edge},
                negative_slope=self.negative_slope,
                apply_mask_to_h=apply_mask,
                interpret=gat_train.FORCE_INTERPRET,
                pack=self.pack,
            )
        else:
            dt = self.dtype or edge_attr.dtype
            eproj = jnp.einsum("bec,ch->beh", edge_attr.astype(dt),
                               w_edge.astype(dt))
            out, alpha = gat_layer_reference(
                h=h_in, xf=xf, instr=instruction, gate=gate,
                src=batch.edge_src, dst=batch.edge_dst,
                edge_mask=batch.edge_mask, node_mask=batch.node_mask,
                eproj=eproj, params=params,
                negative_slope=self.negative_slope,
                apply_mask_to_h=apply_mask,
            )
        return out, mask, alpha


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
    node_classification: bool = False
    num_node_classes: int = 2577        # mgat.py:98-102
    sampler_type: Optional[str] = None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0
    use_pallas: bool = True
    pack: Union[int, str, None] = None
    mask_dropout: float = 0.2           # masking.py:159,196
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [B, N, C]
        batch: GraphBatch,
        edge_attr: jax.Array,           # [B, E, C]
        instr_vectors: jax.Array,       # [B, n_instr, C]
        global_language_feats: jax.Array,  # [B, C]
        train: bool = False,
        aimle_states: Optional[dict] = None,
        explainer: bool = False,
        explainer_stage: int = 0,
        expl_bypass_x: Optional[jax.Array] = None,
    ):
        """-> (h, last_mask | None, node_masks list, edge_attns list,
        node_logits_layers list).

        Explainer bypass (``mgat.py:140-141``): with ``explainer``,
        layer ``explainer_stage - 1`` receives ``expl_bypass_x``
        ``[B, N, C]`` as its input instead of the running ``h``.
        """
        in_ch = self.channels * 2 if self.concat_instr else self.channels
        h, c = self.heads, self.channels
        hcur = x
        mask = None
        node_masks, edge_attns = [], []
        node_logits_layers = []

        # per-node classification head (mgat.py:98-102; the reference
        # defines it but never wires it — here it is functional behind
        # the --node_classification flag)
        node_head = None
        if self.node_classification:
            from .layers import MLP

            node_head = MLP((512, self.num_node_classes), gelu_last=False,
                            dtype=self.dtype, name="node_logits")

        # all layers' lin_edge weights live stacked under the same
        # param path the previous nn.Dense used (lin_edge_all/kernel);
        # each layer projects the shared encoded edges with its slice —
        # the fused kernel does so in VMEM, the XLA path via einsum
        ek = _RawKernel(edge_attr.shape[-1], self.num_ins * h * c,
                        name="lin_edge_all")()

        global_mask = None
        if self.use_global_mask:
            global_mask = jnp.ones(hcur.shape[:2] + (1,), hcur.dtype)

        for i in range(self.num_ins):
            ins = instr_vectors[:, i, :]            # [B, C]
            if explainer and (explainer_stage - 1) == i:   # mgat.py:140-141
                hcur = jnp.asarray(expl_bypass_x, hcur.dtype)
            st = (aimle_states or {}).get(i)
            hcur, m_i, alpha = MGATLayer(
                in_channels=in_ch, out_channels=self.channels,
                heads=self.heads,
                masking_threshold=float(self.masking_thresholds[i]),
                use_instr=self.use_instr, use_topk=self.use_topk,
                concat_instr=self.concat_instr,
                use_all_instrs=self.use_all_instrs,
                interpretable_mode=(self.interpretable_mode
                                    and not self.use_global_mask),
                sampler_type=self.sampler_type, sample_k=self.sample_k,
                nb_samples=self.nb_samples, alpha=self.alpha, beta=self.beta,
                tau=self.tau, use_pallas=self.use_pallas, pack=self.pack,
                mask_dropout=self.mask_dropout,
                dtype=self.dtype, name=f"conv{i}",
            )(hcur, batch, edge_attr, ek[:, i * h * c:(i + 1) * h * c],
              ins, global_language_feats,
              all_instrs=instr_vectors, train=train, aimle_state=st)

            node_masks.append(m_i)
            edge_attns.append(alpha)
            if node_head is not None:
                node_logits_layers.append(node_head(hcur))
            if m_i is not None:
                mask = m_i
            if self.use_global_mask:
                if m_i is not None:
                    global_mask = m_i * global_mask  # mgat.py:161-163
                hcur = global_mask * hcur            # mgat.py:174-175

        return hcur, mask, node_masks, edge_attns, node_logits_layers
