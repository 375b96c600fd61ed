"""The top ISubGVQA model.

Equivalent of ``ISubGVQA`` (``models/isubgvqa.py:17-297``): question
encoding, optional differentiable text-token sampling, program decoding
into instruction vectors, scene-graph encoding, masked-GAT message
passing, question-conditioned pooling, and the fusion classifier over
the 1842 GQA short answers.

Documented deviation from the reference: ``isubgvqa.py:244-246``
flattens the ``[n_instr, B, D]`` instruction tensor with a raw
``.view(B, n_instr, D)`` — a memory reinterpretation that scrambles
instruction vectors **across batch samples** whenever ``B != n_instr``
(at the reference's eval batch size 1 it is a no-op, so published
metrics reflect the unscrambled semantics).  Cross-sample leakage is
also unimplementable under SPMD sharding; we use the proper transpose.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..config import Config
from ..data.batching import GraphBatch
from ..sampling import SimpleConfig, simple_sample
from .layers import MLP
from .mgat import MGAT
from .pooling import GlobalAttentionPooling
from .question_decoder import QuestionDecoder
from .question_encoder import QuestionEncoder
from .scene_graph_encoder import SceneGraphEncoder


class ModelOutput(struct.PyTreeNode):
    """Mirrors the reference forward's 5-tuple (``isubgvqa.py:297``)."""

    logits: jax.Array                       # [B, num_answers]
    node_mask: Optional[jax.Array]          # [N_pad, 1] last-layer mask
    gate: Optional[jax.Array]               # [N_pad, 1] pooling attention
    node_logits_layers: tuple               # always empty (mgat.py:125,179)
    mask_text: Optional[jax.Array]          # [B, L] text-sampling mask


class ISubGVQA(nn.Module):
    cfg: Config
    sg_vocab_size: int = 2000
    sg_vocab_vectors: Optional[object] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False,
                 aimle_states: Optional[dict] = None,
                 explainer: bool = False, explainer_stage: int = 0,
                 expl_bypass_x: Optional[jax.Array] = None):
        """Forward.  With ``explainer`` set, supports the reference's
        external-explainer protocol (``isubgvqa.py:249-253,294-295``):
        ``explainer_stage == 0`` injects ``expl_bypass_x [B, N, 300]``
        as the scene-graph token-embedding sum
        (``scene_graph_encoder.py:64-74``); ``explainer_stage == i >=
        1`` injects it as MGAT layer ``i-1``'s input
        (``mgat.py:140-141``); and the return value is the bare logits
        array (``isubgvqa.py:294-295``).  The reference's
        stage-dependent input *swap* (``isubgvqa.py:249-253``) is not
        reproduced literally: it routes raw token ids into float
        feature slots (dead code in the reference's own entry points);
        the injection points here carry its coherent intent.
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        hid = cfg.general_hidden_dim            # 300
        tdim = cfg.text_emb_dim                 # 512

        # ---- question encoding (isubgvqa.py:228)
        enc = QuestionEncoder(
            dim=tdim, num_heads=cfg.num_heads, ffn_dim=4 * 512,
            num_layers=cfg.encoder_layers, dropout=cfg.dropout,
            vocab_size=cfg.text_vocab_size, use_pallas=cfg.use_pallas,
            dtype=dtype,
            name="question_encoder",
        )(batch.qst_tokens, batch.qst_mask, deterministic=not train)

        # ---- optional text sampling (isubgvqa.py:229-241)
        mask_text = None
        if cfg.text_sampling:
            keys = MLP((tdim,), dtype=dtype, name="qsts_att_keys")(enc)
            queries = MLP((tdim,), dtype=dtype, name="qsts_att_query")(enc)
            # logits[b, i] = Σ_j keys[b,i]·queries[b,j] / sqrt(D)
            logits = jnp.einsum("bid,bjd->bi", keys, queries,
                                preferred_element_type=jnp.float32)
            logits = logits / math.sqrt(enc.shape[-1])
            mask_text = simple_sample(
                logits.astype(jnp.float32), self.make_rng("sampler"),
                SimpleConfig(k=cfg.mgat_layers), train=train,
            )[0][0]                                  # [B, L]
            enc = enc * mask_text[:, :, None].astype(enc.dtype)

        # ---- program decoding (isubgvqa.py:243)
        qst_feats = QuestionDecoder(
            n_instructions=cfg.mgat_layers, dim=tdim, num_heads=cfg.num_heads,
            ffn_dim=4 * 512, num_layers=cfg.decoder_layers,
            dropout=cfg.dropout, use_pallas=cfg.use_pallas, dtype=dtype,
            name="program_decoder",
        )(enc, deterministic=not train)             # [B, n_instr, 512]

        # global language feature (isubgvqa.py:244-247; see module doc)
        flat = qst_feats.reshape(qst_feats.shape[0], -1)
        lang = MLP((hid,), dtype=dtype, name="qsts_reduction")(flat)  # [B,300]
        instr = MLP((hid,), dtype=dtype, name="instr_reduction")(qst_feats)

        # ---- scene graph encoding (isubgvqa.py:255-263)
        x_enc, e_enc = SceneGraphEncoder(
            sg_vocab_size=self.sg_vocab_size, hidden_dim=hid,
            sg_emb_dim=hid,
            vocab_vectors=self.sg_vocab_vectors,
            bn_axis_name=self.bn_axis_name, use_pallas=cfg.use_pallas,
            pack=cfg.kernel_pack,
            dtype=dtype, name="scene_graph_encoder",
        )(batch, deterministic=not train,
          expl_x_embed_sum=(expl_bypass_x
                            if explainer and explainer_stage == 0
                            else None))

        # ---- masked GAT stack (isubgvqa.py:267-278)
        x_mgat, imle_mask, node_masks, edge_attns, node_logits_layers = MGAT(
            channels=hid, num_ins=cfg.mgat_layers, heads=cfg.gat_heads,
            masking_thresholds=cfg.mgat_masks, use_instr=cfg.use_instruction,
            use_topk=cfg.use_topk, interpretable_mode=cfg.interpretable_mode,
            concat_instr=cfg.concat_instr, use_all_instrs=cfg.use_all_instrs,
            use_global_mask=cfg.use_global_mask,
            node_classification=cfg.node_classification,
            sampler_type=cfg.sampler_type,
            sample_k=cfg.sample_k, nb_samples=cfg.nb_samples, alpha=cfg.alpha,
            beta=cfg.beta, tau=cfg.tau, use_pallas=cfg.use_pallas,
            pack=cfg.kernel_pack, mask_dropout=cfg.mask_dropout,
            dtype=dtype, name="gat_seq",
        )(x_enc, batch, e_enc, instr, lang, train=train,
          aimle_states=aimle_states, explainer=explainer,
          explainer_stage=explainer_stage,
          expl_bypass_x=(expl_bypass_x if explainer_stage >= 1 else None))

        # ---- pooling + fusion classifier (isubgvqa.py:280-292)
        pooled, gate = GlobalAttentionPooling(
            num_node_features=hid, num_out_features=hid, dtype=dtype,
            name="graph_global_attention_pooling",
        )(x_mgat, lang, batch, node_mask=imle_mask)

        fused = jnp.concatenate([pooled, lang, pooled * lang], axis=1)
        fused = nn.Dense(512, dtype=dtype, name="embedding")(fused)
        fused = nn.gelu(fused, approximate=False)
        fused = nn.Dropout(cfg.head_dropout)(fused, deterministic=not train)
        logits = nn.Dense(cfg.num_answers, dtype=dtype, name="logit_fc")(fused)

        if explainer:                          # isubgvqa.py:294-295
            return logits.astype(jnp.float32)

        return ModelOutput(
            logits=logits.astype(jnp.float32),
            node_mask=imle_mask,
            gate=gate,
            node_logits_layers=tuple(node_logits_layers),
            mask_text=mask_text,
        )
