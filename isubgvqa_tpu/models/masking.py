"""Mask head: scores nodes against the question and samples a discrete
node subset with the configured differentiable top-k sampler.

Equivalent of ``MaskingModel`` (``models/masking.py:23-199``):

* gate score = bilinear(node_nn(x), ques_nn(u)) / sqrt(d) + GELU
  (``masking.py:151-155``) or, with ``use_all_instrs``, softmax
  attention of all instruction vectors over the node batch
  (``:141-149``);
* top-k path: dropout(0.2) -> sampler over the ``[B, N_max]`` scores
  (``:158-176``).  The dense layout *is* ``to_dense_batch``'s output;
  padding slots carry score 0 and deliberately compete in the top-k —
  exactly the reference's zero-fill semantics;
* non-top-k path: dropout -> sigmoid -> hard ``> 0.5`` threshold with
  no straight-through gradient (``:195-198``), reproduced.

Sampler configs mirror ``get_imle_samplers`` / ``get_aimle_samplers``
(``masking.py:214-283``): Gumbel(0, 0.3) noise, train/val variants.
AIMLE's adaptive state enters explicitly; its update leaves through
the state input's cotangent.

Documented deviation (same family as the ``.view`` scramble, see
``models/isubgvqa.py``): in the reference's bilinear path the call
site passes ``u = imle_att[batch]`` (``mgat_v2_conv.py:166-168``,
already per-node) and the head then indexes ``self.ques_nn(u)[batch]``
AGAIN (``masking.py:153``) — so node ``j`` of graph ``g`` is scored
against the question vector of the graph that contains *node index*
``g``, a cross-sample scramble whenever the batch holds more than one
graph (a no-op at batch size 1, the reference's explanation-extraction
regime).  This rebuild scores every node against its OWN graph's
question vector — the coherent intent, and the only batch-size-
invariant choice (any per-sample result would otherwise depend on
batch composition).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import GraphBatch
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
        x: jax.Array,                     # [B, N, dim_nodes]
        u: jax.Array,                     # [B, dim_questions]
        batch: GraphBatch,
        train: bool = False,
        aimle_state: Optional[AIMLEState] = None,
        use_all_instrs: bool = False,
        all_instrs: Optional[jax.Array] = None,   # [B, n_instr, dim_q]
    ):
        """-> (gate [B, N, 1], new_aimle_state | None)."""
        xq = MLP((self.dim_questions,), dtype=self.dtype, name="node_nn")(x)
        node_mask = batch.node_mask

        if use_all_instrs:
            # masking.py:141-149 over the dense node batch; padding
            # slots are zero vectors, as with to_dense_batch's fill.
            xq_m = jnp.where(node_mask[..., None], xq, 0.0)
            scores = jnp.einsum("bmd,bnd->bmn", all_instrs, xq_m,
                                preferred_element_type=jnp.float32)
            attention = jax.nn.softmax(scores, axis=2)   # masking.py:148
            gate = attention.sum(1)[..., None].astype(xq.dtype)  # [B, N, 1]
        else:
            uq = MLP((self.dim_questions,), dtype=self.dtype, name="ques_nn")(u)
            gate = jnp.einsum("bnd,bd->bn", xq, uq,
                              preferred_element_type=jnp.float32)
            gate = (gate / math.sqrt(xq.shape[-1]))[..., None]  # :151-153
            gate = nn.gelu(gate.astype(xq.dtype), approximate=False)

        new_state = None
        if self.use_topk:
            gate = nn.Dropout(self.dropout)(gate, deterministic=not train)
            # dense scores with zero-filled padding (reference
            # to_dense_batch fill, masking.py:162)
            dense = jnp.where(node_mask, gate[..., 0], 0.0).astype(jnp.float32)
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
            gate = jnp.where(node_mask, out, 0.0).astype(xq.dtype)[..., None]
        else:
            gate = nn.Dropout(self.dropout)(gate, deterministic=not train)
            gate = nn.sigmoid(gate)
            # hard threshold, gradient deliberately severed (masking.py:198)
            gate = (jax.lax.stop_gradient(gate) > 0.5).astype(gate.dtype)
        return gate, new_state
