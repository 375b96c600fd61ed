"""External-explainer bypass protocol
(``isubgvqa.py:249-253,294-295``, ``mgat.py:140-141``,
``scene_graph_encoder.py:64-74``): stage-0 injects the scene-graph
token-embedding sum, stage i >= 1 injects MGAT layer ``i-1``'s input,
and explainer calls return the bare logits array."""

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import build_model, init_model

from test_model import small_cfg


def _setup():
    cfg = small_cfg(mgat_masks=(1.0, 1.0, 1.0, 1.0), sampler_type=None,
                    sample_k=None)
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=cfg.batch_size,
                      max_nodes_per_graph=cfg.max_nodes_per_graph,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    coll = Collator(tok, spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(cfg.batch_size)])
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)
    return model, params, batch_stats, batch


def test_stage0_bypass_roundtrip_and_bare_logits():
    """Feeding the model's own token-embedding sum through the stage-0
    bypass must reproduce the normal forward exactly, and explainer
    calls must return the bare logits array (isubgvqa.py:294-295)."""
    model, params, batch_stats, batch = _setup()
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"sampler": jax.random.PRNGKey(0)}

    out = model.apply(variables, batch, train=False, rngs=rngs)

    emb = np.asarray(
        params["scene_graph_encoder"]["sg_vocab_embedding"]["embedding"])
    x_sum = emb[np.asarray(batch.node_tokens)].sum(-2)       # [B, N, 300]

    logits = model.apply(variables, batch, train=False, rngs=rngs,
                         explainer=True, explainer_stage=0,
                         expl_bypass_x=jnp.asarray(x_sum))
    assert isinstance(logits, jax.Array)                     # bare array
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(out.logits), atol=1e-5)

    # a perturbed bypass must change the answer logits
    logits2 = model.apply(variables, batch, train=False, rngs=rngs,
                          explainer=True, explainer_stage=0,
                          expl_bypass_x=jnp.asarray(x_sum) + 1.0)
    assert not np.allclose(np.asarray(logits2), np.asarray(out.logits))


def test_stage_i_bypass_reaches_only_that_layer():
    """mgat.py:140-141: stage i replaces layer i-1's input; injecting
    at different stages gives different logits, all finite."""
    model, params, batch_stats, batch = _setup()
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"sampler": jax.random.PRNGKey(0)}
    b, n = batch.node_mask.shape
    bypass = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, n, 300)).astype(np.float32))

    base = model.apply(variables, batch, train=False, rngs=rngs)
    outs = []
    for stage in (1, 2, 4):
        lg = model.apply(variables, batch, train=False, rngs=rngs,
                         explainer=True, explainer_stage=stage,
                         expl_bypass_x=bypass)
        lg = np.asarray(lg)
        assert np.all(np.isfinite(lg))
        assert not np.allclose(lg, np.asarray(base.logits))
        outs.append(lg)
    # injecting at different depths must flow through different suffixes
    assert not np.allclose(outs[0], outs[2])
