"""SPMD tests on the simulated 8-device CPU mesh: sharded training
steps match unsharded results; AIMLE state updates survive sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import build_model
from isubgvqa_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                        shard_batch)
from isubgvqa_tpu.train.schedule import make_optimizer
from isubgvqa_tpu.train.state import create_train_state
from isubgvqa_tpu.train.steps import make_train_step

from test_model import small_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(small_cfg(), batch_size=8, sampler_type="aimle",
                              sample_k=3)
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=8, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=12)
    coll = Collator(HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                                      max_len=12), spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(8)])
    model = build_model(cfg, vocab)
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=4)
    state = create_train_state(model, optimizer, batch, cfg)
    return cfg, model, optimizer, state, batch


def test_mesh_has_eight_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_places_leading_axis(setup):
    cfg, model, optimizer, state, batch = setup
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    sh = sharded.qst_tokens.sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), sharded.qst_tokens.ndim)
    # 8 graphs over 8 devices: one graph per device
    assert len(sharded.node_tokens.addressable_shards) == 8


def test_sharded_step_matches_unsharded(setup):
    cfg, model, optimizer, state, batch = setup
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    rng = jax.random.PRNGKey(0)

    s1, m1 = train_step(state, batch, rng)

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s2, m2 = train_step(state_r, batch_s, rng)

    np.testing.assert_allclose(float(m1["loss_sum"]), float(m2["loss_sum"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["correct"]), float(m2["correct"]))
    # parameters after one update agree
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-5)


def test_aimle_state_updates_under_sharding(setup):
    cfg, model, optimizer, state, batch = setup
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s2, _ = train_step(state_r, batch_s, jax.random.PRNGKey(0))
    st = s2.aimle_states[3]
    assert float(st.grad_norm) != 1.0   # EMA moved
    assert abs(float(st.beta)) <= 2e-4  # stepped from 0 by +-1e-4
