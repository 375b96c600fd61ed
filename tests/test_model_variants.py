"""Forward tests for the less-common model configurations:
use_all_instrs, concat_instr, use_global_mask, interpretable_mode,
node_classification, non-topk threshold masking."""

import dataclasses

import jax
import numpy as np
import pytest

from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import build_model, init_model

from test_model import small_cfg


@pytest.fixture(scope="module")
def data():
    cfg = small_cfg()
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=4, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=12)
    coll = Collator(HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                                      max_len=12), spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(4)])
    return vocab, batch


def run(cfg, vocab, batch, train=False):
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      batch, train=train,
                      rngs={"sampler": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                      mutable=["batch_stats"] if train else False)
    return out[0] if train else out


@pytest.mark.parametrize("variant", [
    dict(use_all_instrs=True),
    dict(concat_instr=True),
    dict(use_global_mask=True),
    dict(interpretable_mode=True),
    dict(node_classification=True),
    dict(use_topk=False),
    dict(mgat_masks=(0.3, 1.0, 0.5, 0.15)),   # multiple masked layers
])
def test_variant_forward_finite(data, variant):
    vocab, batch = data
    cfg = dataclasses.replace(small_cfg(), **variant)
    out = run(cfg, vocab, batch)
    assert out.logits.shape == (4, cfg.num_answers)
    assert np.all(np.isfinite(np.asarray(out.logits)))
    if variant.get("node_classification"):
        assert len(out.node_logits_layers) == cfg.mgat_layers
        assert out.node_logits_layers[0].shape == (4, 32, 2577)
    else:
        assert out.node_logits_layers == ()


def test_non_topk_mask_is_hard(data):
    vocab, batch = data
    cfg = dataclasses.replace(small_cfg(), use_topk=False)
    out = run(cfg, vocab, batch)
    vals = set(np.unique(np.asarray(out.node_mask)))
    assert vals <= {0.0, 1.0}


def test_nondefault_hidden_dim_builds_and_runs(data):
    """--general_hidden_dim other than 300 must work: sg_emb_dim now
    tracks the hidden dim and 300-d GloVe vectors fall back to seeded
    init when widths mismatch (previously a shape error)."""
    vocab, batch = data
    cfg = small_cfg(general_hidden_dim=64, text_emb_dim=128)
    out = run(cfg, vocab, batch)
    assert np.isfinite(np.asarray(out.logits)).all()
