"""Reference-checkpoint conversion: a synthetic torch-style state_dict
with the reference's exact module names/shapes must convert into a
parameter tree this framework's model accepts and runs with."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.convert import convert_state_dict
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import build_model, init_model

from test_model import small_cfg


def fake_reference_state_dict(rng, text_vocab=512, sg_vocab=65, d=512,
                              c=300, heads=4, answers=32,
                              enc_layers=4, dec_layers=3, mgat_layers=4,
                              masked_layers=(3,)):
    """Reference ``model.state_dict()`` surrogate (names follow
    isubgvqa.py and submodules; shapes follow torch conventions)."""
    sd = {}

    def lin(prefix, fin, fout):
        sd[f"{prefix}.weight"] = rng.normal(size=(fout, fin)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(fout,)).astype(np.float32)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = np.ones(dim, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    def bn(prefix, dim):
        ln(prefix, dim)
        sd[f"{prefix}.running_mean"] = np.zeros(dim, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(dim, np.float32)

    def attn(prefix, dim):
        sd[f"{prefix}.in_proj_weight"] = rng.normal(
            size=(3 * dim, dim)).astype(np.float32)
        sd[f"{prefix}.in_proj_bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
        lin(f"{prefix}.out_proj", dim, dim)

    sd["text_vocab_embedding.token_embedding.weight"] = rng.normal(
        size=(text_vocab, d)).astype(np.float32)
    sd["text_vocab_embedding.position_embedding.weight"] = rng.normal(
        size=(77, d)).astype(np.float32)
    for i in range(enc_layers):
        pre = f"question_encoder.transformer_encoder.layers.{i}"
        attn(f"{pre}.self_attn", d)
        lin(f"{pre}.linear1", d, 2048)
        lin(f"{pre}.linear2", 2048, d)
        ln(f"{pre}.norm1", d)
        ln(f"{pre}.norm2", d)
    ln("question_encoder.transformer_encoder.norm", d)

    sd["program_decoder.query_embed.weight"] = rng.normal(
        size=(mgat_layers, d)).astype(np.float32)
    for i in range(dec_layers):
        pre = f"program_decoder.coarse_decoder.layers.{i}"
        attn(f"{pre}.self_attn", d)
        attn(f"{pre}.multihead_attn", d)
        lin(f"{pre}.linear1", d, 2048)
        lin(f"{pre}.linear2", 2048, d)
        for n in ("norm1", "norm2", "norm3"):
            ln(f"{pre}.{n}", d)
    ln("program_decoder.coarse_decoder.norm", d)

    sge = "scene_graph_encoder"
    sd[f"{sge}.sg_vocab_embedding.weight"] = rng.normal(
        size=(sg_vocab, c)).astype(np.float32)
    bn(f"{sge}.bbox_encoding.0", 4)
    lin(f"{sge}.bbox_encoding.1", 4, 16)
    bn(f"{sge}.bbox_encoding.3", 16)
    lin(f"{sge}.bbox_encoding.4", 16, 32)
    bn(f"{sge}.feat_reduc.0", c + 32)
    lin(f"{sge}.feat_reduc.1", c + 32, c)
    meta = f"{sge}.scene_graph_encoding_layer"
    lin(f"{meta}.edge_model.edge_mlp.0", 3 * c, c)
    lin(f"{meta}.edge_model.edge_mlp.2", c, c)
    lin(f"{meta}.node_model.node_mlp_1.0", 2 * c, c)
    lin(f"{meta}.node_model.node_mlp_1.2", c, c)
    lin(f"{meta}.node_model.node_mlp_2.0", 2 * c, c)
    lin(f"{meta}.node_model.node_mlp_2.2", c, c)
    ln(f"{sge}.graph_layer_norm", c)
    sd[f"{sge}.graph_layer_norm.mean_scale"] = np.ones(c, np.float32)

    hc = heads * (c)
    for i in range(mgat_layers):
        conv = f"gat_seq.convs.{i}"
        lin(f"{conv}.lin_l", c, hc)
        lin(f"{conv}.lin_r", c, hc)
        sd[f"{conv}.lin_edge.weight"] = rng.normal(
            size=(hc, c)).astype(np.float32)
        sd[f"{conv}.att"] = rng.normal(size=(1, heads, c)).astype(np.float32)
        sd[f"{conv}.bias"] = np.zeros(hc, np.float32)
        if i in masked_layers:
            lin(f"{conv}.mask.node_nn.0", c, c)
            lin(f"{conv}.mask.ques_nn.0", c, c)
        lin(f"gat_seq.x_proj.{i}.0", hc, hc // 2)
        lin(f"gat_seq.x_proj.{i}.2", hc // 2, c)
        ln(f"gat_seq.bns.{i}", c)
        sd[f"gat_seq.bns.{i}.mean_scale"] = np.ones(c, np.float32)

    for n in ("node_nn", "ques_nn"):
        lin(f"graph_global_attention_pooling.{n}.0", c, c)
        lin(f"graph_global_attention_pooling.{n}.2", c, c)
    lin("qsts_reduction.0", d * mgat_layers, c)
    lin("instr_reduction.0", d, c)
    lin("embedding.0", 3 * c, 512)
    lin("logit_fc", 512, answers)
    return sd


def tree_shapes(tree):
    return {jax.tree_util.keystr(k): np.shape(v)
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_convert_matches_model_tree(rng):
    cfg = small_cfg()
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=4, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=12)
    coll = Collator(HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                                      max_len=12), spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(4)])
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)

    sd = fake_reference_state_dict(rng, text_vocab=cfg.text_vocab_size,
                                   sg_vocab=len(vocab),
                                   answers=cfg.num_answers)
    conv_params, conv_stats = convert_state_dict(sd)

    want = tree_shapes(params)
    got = tree_shapes(conv_params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converter missing params: {missing[:8]}"
    assert not extra, f"converter extra params: {extra[:8]}"
    for k in want:
        assert want[k] == got[k], f"shape mismatch at {k}: {want[k]} vs {got[k]}"

    want_s = tree_shapes(batch_stats)
    got_s = tree_shapes(conv_stats)
    assert set(want_s) == set(got_s)

    # converted parameters actually run through the model
    out = model.apply({"params": conv_params, "batch_stats": conv_stats},
                      batch, train=False,
                      rngs={"sampler": jax.random.PRNGKey(0)})
    assert out.logits.shape == (4, cfg.num_answers)
    assert np.all(np.isfinite(np.asarray(out.logits)))

    # spot-check a weight mapping (transpose semantics)
    np.testing.assert_allclose(
        np.asarray(conv_params["logit_fc"]["kernel"]),
        sd["logit_fc.weight"].T)


def test_strip_ddp_prefix(rng):
    from isubgvqa_tpu.convert import strip_ddp_prefix

    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_ddp_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}
