"""Mask head: scores nodes against the question and samples a discrete
node subset with the configured differentiable top-k sampler.

Equivalent of ``MaskingModel`` (``models/masking.py:23-199``):

* gate score = bilinear(node_nn(x), ques_nn(u)) / sqrt(d) + GELU
  (``masking.py:151-155``) or, with ``use_all_instrs``, softmax
  attention of all instruction vectors over the dense node batch
  (``:141-149``);
* top-k path: dropout(0.2) -> dense ``[B, N_max]`` view (zero-filled,
  like ``to_dense_batch`` — padding slots deliberately compete in the
  top-k, reference behavior) -> sampler -> flatten (``:158-176``);
* non-top-k path: dropout -> sigmoid -> hard ``> 0.5`` threshold with
  no straight-through gradient (``:195-198``), reproduced.

Sampler configs mirror ``get_imle_samplers`` / ``get_aimle_samplers``
(``masking.py:214-283``): Gumbel(0, 0.3) noise, train/val variants.
AIMLE's adaptive state enters and leaves explicitly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import GraphBatch
from ..ops.dense import from_dense_batch, to_dense_batch
from ..sampling import (
    AIMLEConfig,
    AIMLEState,
    GumbelSamplerConfig,
    IMLEConfig,
    SimpleConfig,
    aimle_topk,
    gumbel_topk_sample,
    imle_topk,
    simple_sample,
)
from .layers import MLP


class MaskingModel(nn.Module):
    dim_nodes: int
    dim_questions: int
    masking_threshold: float = 0.3
    use_topk: bool = True
    sampler_type: Optional[str] = None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0
    dropout: float = 0.2       # masking.py:159,196
    dtype: Optional[jnp.dtype] = None

    def _sampler_cfgs(self):
        st = self.sampler_type
        if st == "imle":
            train = IMLEConfig(k=self.sample_k, nb_samples=self.nb_samples,
                               input_noise_temperature=self.tau,
                               target_noise_temperature=self.tau,
                               alpha=self.alpha, beta=self.beta)
            return train, train.for_eval()
        if st == "aimle":
            train = AIMLEConfig(k=self.sample_k, nb_samples=self.nb_samples,
                                theta_noise_temperature=self.tau,
                                target_noise_temperature=self.tau,
                                alpha=self.alpha)
            return train, train.for_eval()
        if st == "simple":
            cfg = SimpleConfig(k=self.sample_k)
            return cfg, cfg
        if st == "gumbel":
            cfg = GumbelSamplerConfig(k=self.sample_k)
            return cfg, cfg
        raise ValueError(f"unknown sampler_type {st!r}")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # [N_pad, dim_nodes]
        u: jax.Array,                     # [N_pad, dim_questions] (per-node)
        batch: GraphBatch,
        train: bool = False,
        aimle_state: Optional[AIMLEState] = None,
        use_all_instrs: bool = False,
        all_instrs: Optional[jax.Array] = None,   # [B, n_instr, dim_q]
    ):
        """-> (gate [N_pad, 1], new_aimle_state | None)."""
        xq = MLP((self.dim_questions,), dtype=self.dtype, name="node_nn")(x)

        if use_all_instrs:
            dense_x, _ = to_dense_batch(
                xq, batch.node_graph, batch.node_pos,
                batch.num_graphs, batch.max_nodes_per_graph)
            scores = jnp.einsum("bmd,bnd->bmn", all_instrs, dense_x,
                                preferred_element_type=jnp.float32)
            attention = jax.nn.softmax(scores, axis=2)   # masking.py:148
            gate_dense = attention.sum(1)                # [B, N_max]
            gate = from_dense_batch(gate_dense, batch.node_graph,
                                    batch.node_pos,
                                    valid_mask=batch.node_mask)[:, None]
        else:
            uq = MLP((self.dim_questions,), dtype=self.dtype, name="ques_nn")(u)
            gate = jnp.sum(xq * uq, axis=-1, keepdims=True)
            gate = gate / math.sqrt(xq.shape[-1])        # masking.py:151-153
            gate = nn.gelu(gate)

        new_state = None
        if self.use_topk:
            gate = nn.Dropout(self.dropout)(gate, deterministic=not train)
            dense, _ = to_dense_batch(
                gate[:, 0], batch.node_graph, batch.node_pos,
                batch.num_graphs, batch.max_nodes_per_graph, fill=0.0)
            key = self.make_rng("sampler")
            st = self.sampler_type
            cfg_train, cfg_val = self._sampler_cfgs()
            cfg = cfg_train if train else cfg_val
            if st == "imle":
                out = imle_topk(dense, key, cfg)[0]
            elif st == "aimle":
                assert aimle_state is not None
                out = aimle_topk(dense, aimle_state, key, cfg)[0]
                new_state = aimle_state   # updated via cotangent smuggling
            elif st == "simple":
                out = simple_sample(dense, key, cfg, train=train)[0][0]
            elif st == "gumbel":
                out = gumbel_topk_sample(dense, key, cfg, train=train)[0]
            else:
                raise ValueError(f"unknown sampler_type {st!r}")
            gate = from_dense_batch(out, batch.node_graph, batch.node_pos,
                                    valid_mask=batch.node_mask)[:, None]
        else:
            gate = nn.Dropout(self.dropout)(gate, deterministic=not train)
            gate = nn.sigmoid(gate)
            # hard threshold, gradient deliberately severed (masking.py:198)
            gate = (jax.lax.stop_gradient(gate) > 0.5).astype(gate.dtype)
        return gate, new_state
