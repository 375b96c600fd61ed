"""Convert reference PyTorch ISubGVQA checkpoints to this framework.

Maps the reference ``model.state_dict()`` (``training/train_loop.py:
88-94`` payloads, possibly DDP-prefixed) onto this framework's flax
parameter / batch-stats trees, so models trained with the
PyTorch/PyG reference can be served or fine-tuned here.

Name correspondence (reference module -> flax path):

==============================================  =================================
isubgvqa.py module                               flax param path
==============================================  =================================
text_vocab_embedding.token_embedding             question_encoder/text_vocab_embedding/token_embedding
question_encoder.transformer_encoder.layers.i    question_encoder/layer{i} (in_proj split into q/k/v)
program_decoder.query_embed                      program_decoder/query_embed
program_decoder.coarse_decoder.layers.i          program_decoder/layer{i}
scene_graph_encoder.sg_vocab_embedding           scene_graph_encoder/sg_vocab_embedding
scene_graph_encoder.bbox_encoding.{0,1,3,4}      .../bbox_bn0, bbox_lin0, bbox_bn1, bbox_lin1
scene_graph_encoder.feat_reduc.{0,1}             .../reduc_bn, reduc_lin
scene_graph_encoder.scene_graph_encoding_layer   .../edge_mlp, node_mlp_1, node_mlp_2
scene_graph_encoder.graph_layer_norm             .../graph_layer_norm
gat_seq.convs.i.{lin_l,lin_r,att,bias}           gat_seq/conv{i}/...
gat_seq.convs.i.lin_edge (x4)                    gat_seq/lin_edge_all (stacked)
gat_seq.convs.i.mask.{node_nn,ques_nn}           gat_seq/conv{i}/mask/...
gat_seq.x_proj.i / gat_seq.bns.i                 gat_seq/conv{i}/x_proj_* / gn_*
graph_global_attention_pooling.{node,ques}_nn    graph_global_attention_pooling/...
qsts_reduction.0 / instr_reduction.0             qsts_reduction/lin0, instr_reduction/lin0
embedding.0 / logit_fc                           embedding, logit_fc
==============================================  =================================

Weights defined but unused by the reference forward (``gate_nn`` in
the mask head and pooling, ``emb_proj``, ``pos_encoder``,
``node_logits`` unless node-classification) are skipped.

Torch ``Linear.weight`` is ``[out, in]`` -> transposed to flax
``[in, out]``; ``in_proj_weight`` splits into q/k/v.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _a(w) -> np.ndarray:
    return np.asarray(w, np.float32)


def strip_ddp_prefix(sd: Mapping[str, object]) -> Dict[str, object]:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _clip_tables_from_sd(sd: Mapping) -> Dict[str, np.ndarray]:
    """CLIP text token/position tables out of an in-memory state dict
    (any accepted key spelling; see CLIP_TEXT_TABLE_KEYS)."""
    for tok_key, pos_key in CLIP_TEXT_TABLE_KEYS:
        if tok_key in sd and pos_key in sd:
            return {"token_embedding": _a(sd[tok_key]),
                    "position_embedding": _a(sd[pos_key])}
    raise KeyError("no CLIP text-embedding tables in state dict")


def _attn(sd: Mapping, prefix: str) -> Dict:
    """torch nn.MultiheadAttention -> q/k/v/out Dense params."""
    in_w = _a(sd[f"{prefix}.in_proj_weight"])     # [3D, D]
    in_b = _a(sd[f"{prefix}.in_proj_bias"])       # [3D]
    d = in_w.shape[1]
    q_w, k_w, v_w = in_w[:d].T, in_w[d:2 * d].T, in_w[2 * d:].T
    q_b, k_b, v_b = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
    return {
        "q": {"kernel": q_w, "bias": q_b},
        "k": {"kernel": k_w, "bias": k_b},
        "v": {"kernel": v_w, "bias": v_b},
        "out": {"kernel": _t(sd[f"{prefix}.out_proj.weight"]),
                "bias": _a(sd[f"{prefix}.out_proj.bias"])},
    }


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _a(sd[f"{prefix}.weight"]),
            "bias": _a(sd[f"{prefix}.bias"])}


def _lin(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": _a(sd[f"{prefix}.bias"])}


def _mlp(sd: Mapping, prefix: str, idxs=(0, 2)) -> Dict:
    return {f"lin{j}": _lin(sd, f"{prefix}.{i}") for j, i in enumerate(idxs)}



def _bn_params(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _a(sd[f"{prefix}.weight"]),
            "bias": _a(sd[f"{prefix}.bias"])}


def _bn_stats(sd: Mapping, prefix: str) -> Dict:
    return {"mean": _a(sd[f"{prefix}.running_mean"]),
            "var": _a(sd[f"{prefix}.running_var"])}


def convert_state_dict(sd: Mapping[str, object],
                       encoder_layers: int = 4,
                       decoder_layers: int = 3,
                       mgat_layers: int = 4) -> tuple[Dict, Dict]:
    """Reference state_dict -> (params, batch_stats) flax trees."""
    sd = strip_ddp_prefix(sd)
    params: Dict = {}
    stats: Dict = {}

    def have(prefix: str) -> bool:
        return any(k.startswith(prefix) for k in sd)

    # ---- question encoder
    qe: Dict = {
        # same key search as load_clip_text_tables so the converter and
        # the --clip_weights init path produce identical tables
        "text_vocab_embedding": {
            k: {"embedding": v} for k, v in _clip_tables_from_sd(sd).items()
        },
        "final_norm": _ln(sd, "question_encoder.transformer_encoder.norm"),
    }
    for i in range(encoder_layers):
        pre = f"question_encoder.transformer_encoder.layers.{i}"
        qe[f"layer{i}"] = {
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "ffn1": _lin(sd, f"{pre}.linear1"),
            "ffn2": _lin(sd, f"{pre}.linear2"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
        }
    params["question_encoder"] = qe

    # ---- program decoder
    pd: Dict = {
        "query_embed": _a(sd["program_decoder.query_embed.weight"]),
        "final_norm": _ln(sd, "program_decoder.coarse_decoder.norm"),
    }
    for i in range(decoder_layers):
        pre = f"program_decoder.coarse_decoder.layers.{i}"
        pd[f"layer{i}"] = {
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "cross_attn": _attn(sd, f"{pre}.multihead_attn"),
            "ffn1": _lin(sd, f"{pre}.linear1"),
            "ffn2": _lin(sd, f"{pre}.linear2"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "norm3": _ln(sd, f"{pre}.norm3"),
        }
    params["program_decoder"] = pd

    # ---- scene graph encoder (optional for partial checkpoints)
    sge_prefix = "scene_graph_encoder"
    meta = f"{sge_prefix}.scene_graph_encoding_layer"
    if not have(sge_prefix):
        return params, stats
    params["scene_graph_encoder"] = {
        "sg_vocab_embedding": {"embedding": _a(
            sd[f"{sge_prefix}.sg_vocab_embedding.weight"])},
        "bbox_bn0": _bn_params(sd, f"{sge_prefix}.bbox_encoding.0"),
        "bbox_lin0": _lin(sd, f"{sge_prefix}.bbox_encoding.1"),
        "bbox_bn1": _bn_params(sd, f"{sge_prefix}.bbox_encoding.3"),
        "bbox_lin1": _lin(sd, f"{sge_prefix}.bbox_encoding.4"),
        "reduc_bn": _bn_params(sd, f"{sge_prefix}.feat_reduc.0"),
        "reduc_lin": _lin(sd, f"{sge_prefix}.feat_reduc.1"),
        # MetaLayer MLPs live as raw kernels (fused-kernel layout)
        "edge_mlp_w1": _t(sd[f"{meta}.edge_model.edge_mlp.0.weight"]),
        "edge_mlp_b1": _a(sd[f"{meta}.edge_model.edge_mlp.0.bias"]),
        "edge_mlp_w2": _t(sd[f"{meta}.edge_model.edge_mlp.2.weight"]),
        "edge_mlp_b2": _a(sd[f"{meta}.edge_model.edge_mlp.2.bias"]),
        "node_mlp1_w1": _t(sd[f"{meta}.node_model.node_mlp_1.0.weight"]),
        "node_mlp1_b1": _a(sd[f"{meta}.node_model.node_mlp_1.0.bias"]),
        "node_mlp1_w2": _t(sd[f"{meta}.node_model.node_mlp_1.2.weight"]),
        "node_mlp1_b2": _a(sd[f"{meta}.node_model.node_mlp_1.2.bias"]),
        "node_mlp2_w1": _t(sd[f"{meta}.node_model.node_mlp_2.0.weight"]),
        "node_mlp2_b1": _a(sd[f"{meta}.node_model.node_mlp_2.0.bias"]),
        "node_mlp2_w2": _t(sd[f"{meta}.node_model.node_mlp_2.2.weight"]),
        "node_mlp2_b2": _a(sd[f"{meta}.node_model.node_mlp_2.2.bias"]),
        "gn_weight": _a(sd[f"{sge_prefix}.graph_layer_norm.weight"]),
        "gn_bias": _a(sd[f"{sge_prefix}.graph_layer_norm.bias"]),
        "gn_mean_scale": _a(sd[f"{sge_prefix}.graph_layer_norm.mean_scale"]),
    }
    stats["scene_graph_encoder"] = {
        "bbox_bn0": _bn_stats(sd, f"{sge_prefix}.bbox_encoding.0"),
        "bbox_bn1": _bn_stats(sd, f"{sge_prefix}.bbox_encoding.3"),
        "reduc_bn": _bn_stats(sd, f"{sge_prefix}.feat_reduc.0"),
    }

    # ---- MGAT
    gat: Dict = {}
    lin_edges = []
    for i in range(mgat_layers):
        conv = f"gat_seq.convs.{i}"
        layer = {
            "lin_l_kernel": _t(sd[f"{conv}.lin_l.weight"]),
            "lin_l_bias": _a(sd[f"{conv}.lin_l.bias"]),
            "lin_r_kernel": _t(sd[f"{conv}.lin_r.weight"]),
            "lin_r_bias": _a(sd[f"{conv}.lin_r.bias"]),
            "att": _a(sd[f"{conv}.att"]).reshape(
                _a(sd[f"{conv}.att"]).shape[-2:]),
            "bias": _a(sd[f"{conv}.bias"]),
            "x_proj_w1": _t(sd[f"gat_seq.x_proj.{i}.0.weight"]),
            "x_proj_b1": _a(sd[f"gat_seq.x_proj.{i}.0.bias"]),
            "x_proj_w2": _t(sd[f"gat_seq.x_proj.{i}.2.weight"]),
            "x_proj_b2": _a(sd[f"gat_seq.x_proj.{i}.2.bias"]),
            "gn_weight": _a(sd[f"gat_seq.bns.{i}.weight"]),
            "gn_bias": _a(sd[f"gat_seq.bns.{i}.bias"]),
            "gn_mean_scale": _a(sd[f"gat_seq.bns.{i}.mean_scale"]),
        }
        if f"{conv}.mask.node_nn.0.weight" in sd:
            layer["mask"] = {
                "node_nn": {"lin0": _lin(sd, f"{conv}.mask.node_nn.0")},
                "ques_nn": {"lin0": _lin(sd, f"{conv}.mask.ques_nn.0")},
            }
        gat[f"conv{i}"] = layer
        lin_edges.append(_t(sd[f"{conv}.lin_edge.weight"]))
    gat["lin_edge_all"] = {"kernel": np.concatenate(lin_edges, axis=1)}
    params["gat_seq"] = gat

    # ---- pooling + fusion head
    params["graph_global_attention_pooling"] = {
        "node_nn": _mlp(sd, "graph_global_attention_pooling.node_nn"),
        "ques_nn": _mlp(sd, "graph_global_attention_pooling.ques_nn"),
    }
    params["qsts_reduction"] = {"lin0": _lin(sd, "qsts_reduction.0")}
    params["instr_reduction"] = {"lin0": _lin(sd, "instr_reduction.0")}
    params["embedding"] = _lin(sd, "embedding.0")
    params["logit_fc"] = _lin(sd, "logit_fc")

    if "text_sampling.qsts_att_keys.0.weight" in sd or \
            "qsts_att_keys.0.weight" in sd:
        key = "qsts_att_keys.0" if "qsts_att_keys.0.weight" in sd else \
            "text_sampling.qsts_att_keys.0"
        params["qsts_att_keys"] = {"lin0": _lin(sd, key)}
        params["qsts_att_query"] = {"lin0": _lin(
            sd, key.replace("keys", "query"))}

    return params, stats


# Accepted key spellings for the pretrained CLIP text tables, in
# lookup order: this framework's / the reference state-dict names
# (``isubgvqa.py:119-121`` deep-copies CLIPModel's text embeddings into
# ``text_vocab_embedding``), the HuggingFace CLIPModel names the
# reference copies *from*, and bare npz-style keys.
CLIP_TEXT_TABLE_KEYS = (
    ("text_vocab_embedding.token_embedding.weight",
     "text_vocab_embedding.position_embedding.weight"),
    ("text_model.embeddings.token_embedding.weight",
     "text_model.embeddings.position_embedding.weight"),
    ("token_embedding", "position_embedding"),
)


def load_clip_text_tables(path: str) -> Dict[str, np.ndarray]:
    """Load pretrained CLIP text token + position embedding tables.

    One loader serves both consumers — ``--clip_weights`` fresh-model
    initialization (:func:`isubgvqa_tpu.models.build.apply_clip_text_tables`)
    and full-checkpoint conversion — so the two paths produce identical
    tables.  Accepts:

    * ``.npz`` with ``token_embedding`` / ``position_embedding`` arrays
      (or either alternative key spelling below),
    * ``.safetensors`` flat tensor files (e.g. a dumped CLIPModel),
    * torch ``.pth``/``.pt``/``.bin``: a raw state dict, a reference
      training checkpoint (``{"model": state_dict}``,
      ``training/train_loop.py:88-94``; DDP prefixes stripped), or a
      HuggingFace CLIPModel state dict.

    Returns ``{"token_embedding": [V, D], "position_embedding": [P, D]}``
    as float32 numpy arrays.
    """
    lower = path.lower()
    if lower.endswith(".npz"):
        blob = dict(np.load(path))
    elif lower.endswith(".safetensors"):
        from safetensors.numpy import load_file

        blob = load_file(path)
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, Mapping) and "model" in ckpt:
            ckpt = ckpt["model"]
        blob = {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in ckpt.items()}
    blob = strip_ddp_prefix(blob)
    try:
        return _clip_tables_from_sd(blob)
    except KeyError:
        raise KeyError(
            f"no CLIP text-embedding tables found in {path!r}; expected "
            f"one of the key pairs {CLIP_TEXT_TABLE_KEYS} (got keys "
            f"{sorted(blob)[:8]}...)") from None


def convert_checkpoint_file(path: str, out_dir: str, **kw) -> str:
    """Load a reference ``.pth`` with torch (CPU) and write an orbax
    checkpoint loadable by this framework's CheckpointManager."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["model"].items()
          if hasattr(v, "numpy")}
    params, stats = convert_state_dict(sd, **kw)

    import orbax.checkpoint as ocp

    ckpter = ocp.StandardCheckpointer()
    ckpter.save(out_dir, {"params": params, "batch_stats": stats},
                force=True)
    ckpter.wait_until_finished()
    return out_dir


# Config fields recoverable from the reference's checkpointed ``args``
# (the reference persists args wholesale, ``training/train_loop.py:88-94``,
# and rebuilds the model from them, ``run_token_coo.py:29-45``).
_ARGS_CONFIG_FIELDS = (
    "mgat_layers", "sampler_type", "sample_k", "nb_samples", "alpha",
    "beta", "tau", "use_topk", "interpretable_mode", "concat_instr",
    "use_all_instrs", "use_global_mask", "text_sampling",
    "general_hidden_dim",
)


def convert_reference_checkpoint(src: str, out_dir: str):
    """Full reference-checkpoint conversion: torch ``.pth`` -> orbax
    checkpoint + ``<out_dir>.meta.json`` (epoch + Config derived from
    the checkpointed args), restorable by CheckpointManager /
    run_token_coo.py / scripts/parity_report.py.

    Returns ``(out_dir, cfg)``.  Shared by ``tools/convert_checkpoint.py``
    and the parity harness so both produce identical artifacts.
    """
    import json
    import os

    import torch

    from .config import Config

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in strip_ddp_prefix(ckpt["model"]).items()
          if hasattr(v, "numpy")}
    args = ckpt.get("args")
    mgat_layers = getattr(args, "mgat_layers", 4)
    params, stats = convert_state_dict(sd, mgat_layers=mgat_layers)

    cfg_kwargs = {}
    for name in _ARGS_CONFIG_FIELDS:
        if args is not None and hasattr(args, name):
            cfg_kwargs[name] = getattr(args, name)
    if args is not None and hasattr(args, "mgat_masks"):
        cfg_kwargs["mgat_masks"] = tuple(args.mgat_masks)
    cfg = Config(**{k: v for k, v in cfg_kwargs.items() if v is not None})

    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(out_dir, {"params": params, "batch_stats": stats},
                force=True)
    ckpter.wait_until_finished()
    with open(out_dir + ".meta.json", "w") as f:
        json.dump({"epoch": ckpt.get("epoch", -1),
                   "config": json.loads(cfg.to_json())}, f)
    return out_dir, cfg
