"""Full-model forward/backward tests on the synthetic fixture."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data import (
    AnswerMap,
    BucketSpec,
    Collator,
    HashWordTokenizer,
    SceneGraphVocab,
    SyntheticGQA,
)
from isubgvqa_tpu.models.build import build_model, init_model, make_aimle_states


def small_cfg(**kw) -> Config:
    base = dict(
        num_answers=32,
        text_vocab_size=512,
        question_len=12,
        max_nodes_per_graph=32,
        max_edges_per_graph=128,
        batch_size=4,
        compute_dtype="float32",
        sampler_type="gumbel",
        sample_k=3,
        mgat_masks=(1.0, 1.0, 1.0, 0.15),
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=16, seed=0)
    spec = BucketSpec(batch_size=cfg.batch_size,
                      max_nodes_per_graph=cfg.max_nodes_per_graph,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    coll = Collator(tok, spec, vocab=vocab)
    batch, meta = coll.collate([ds[i] for i in range(4)])
    return cfg, vocab, batch


def _forward(cfg, vocab, batch, train=False, aimle_states=None, seed=0):
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch, aimle_states=aimle_states)
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch, train=train, aimle_states=aimle_states,
        rngs={"dropout": jax.random.PRNGKey(seed + 1),
              "sampler": jax.random.PRNGKey(seed + 2)},
        mutable=["batch_stats"],
    )
    return model, params, batch_stats, out


@pytest.mark.parametrize("sampler", ["gumbel", "simple", "imle", "aimle"])
def test_forward_all_samplers(setup, sampler):
    cfg, vocab, batch = setup
    cfg = dataclasses.replace(cfg, sampler_type=sampler)
    aimle_states = make_aimle_states(cfg)
    model, params, bstats, out = _forward(cfg, vocab, batch, train=False,
                                          aimle_states=aimle_states)
    assert out.logits.shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(out.logits)))
    # last layer is masked -> node mask exists; padding slots can win
    # top-k slots (reference to_dense_batch zero-fill semantics), so
    # selected real nodes are <= k per graph
    nm = np.asarray(out.node_mask)[..., 0]        # [B, N]
    nmask = np.asarray(batch.node_mask)
    for gi in range(4):
        assert nm[gi][nmask[gi]].sum() <= 3 + 1e-6
        assert (nm[gi][~nmask[gi]] == 0).all()
    assert out.node_logits_layers == ()


def test_forward_deterministic_eval(setup):
    cfg, vocab, batch = setup
    cfg = dataclasses.replace(cfg, sampler_type="imle")
    _, _, _, out1 = _forward(cfg, vocab, batch, seed=0)
    _, _, _, out2 = _forward(cfg, vocab, batch, seed=99)
    # imle eval is noise-free -> logits identical across sampler seeds
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), rtol=1e-5)


def test_backward_gradients_flow(setup):
    cfg, vocab, batch = setup
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampler": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out.logits)
        return -jnp.mean(logp[jnp.arange(4), batch.labels])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every major component receives gradient
    for key in ["question_encoder", "program_decoder", "scene_graph_encoder",
                "gat_seq", "graph_global_attention_pooling", "logit_fc"]:
        sub = jax.tree_util.tree_leaves(grads[key])
        total = sum(float(jnp.sum(jnp.abs(g))) for g in sub)
        assert total > 0.0, f"no gradient in {key}"


def test_aimle_state_updates_through_model(setup):
    cfg, vocab, batch = setup
    cfg = dataclasses.replace(cfg, sampler_type="aimle", sample_k=3)
    states = make_aimle_states(cfg)
    assert set(states.keys()) == {3}
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch, aimle_states=states)

    def loss_fn(p, st):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True,
            aimle_states=st,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampler": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out.logits)
        return -jnp.mean(logp[jnp.arange(4), batch.labels])

    _, new_states = jax.grad(loss_fn, argnums=(0, 1))(params, states)
    # smuggled state: beta stepped by +-1e-4, EMA moved off 1.0
    assert float(new_states[3].grad_norm) != 1.0
    assert abs(float(new_states[3].beta)) <= 2e-4


def test_text_sampling_branch(setup):
    cfg, vocab, batch = setup
    cfg = dataclasses.replace(cfg, text_sampling=True)
    _, _, _, out = _forward(cfg, vocab, batch)
    assert out.mask_text is not None
    assert out.mask_text.shape == (4, cfg.question_len)
    np.testing.assert_allclose(np.asarray(out.mask_text).sum(-1),
                               cfg.mgat_layers, rtol=1e-4)


def test_forward_jits_once(setup):
    cfg, vocab, batch = setup
    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)

    @jax.jit
    def fwd(p, b, key):
        out = model.apply({"params": p, "batch_stats": batch_stats}, b,
                          train=False, rngs={"sampler": key})
        return out.logits

    l1 = fwd(params, batch, jax.random.PRNGKey(0))
    l2 = fwd(params, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
