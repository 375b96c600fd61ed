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


def test_bucketed_multidevice_step_parity():
    """Multi-host-style bucketed iteration feeds the sharded step:
    running the bucketed batch sequence (two jit specializations)
    over the 8-device mesh matches the unsharded run exactly — the
    configuration enabled by the global-schedule bucketing
    (train/loop.py:_iter_split no longer gates on num_shards == 1)."""
    from isubgvqa_tpu.data.batching import iterate_batches_bucketed

    # small dims keep the 4 compiles (2 shapes x {plain, sharded})
    # within CI budget; the full-size sharded parity is covered at one
    # shape by test_sharded_step_matches_unsharded
    cfg = dataclasses.replace(small_cfg(), batch_size=8,
                              sampler_type="gumbel", sample_k=3,
                              general_hidden_dim=32, text_emb_dim=64)
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=48, seed=0)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size, max_len=12)
    collators = {
        8: Collator(tok, BucketSpec(8, max_nodes_per_graph=8,
                                    max_edges_per_graph=48,
                                    question_len=12), vocab=vocab),
        32: Collator(tok, BucketSpec(8, max_nodes_per_graph=32,
                                     max_edges_per_graph=128,
                                     question_len=12), vocab=vocab),
    }
    all_batches = [b for b, _ in iterate_batches_bucketed(
        ds, collators, shuffle=True, seed=3, drop_last=True)]
    shapes = {b.node_tokens.shape for b in all_batches}
    assert len(shapes) >= 2, "need mixed bucket shapes for the test"
    # one batch per shape keeps the CPU-mesh runtime bounded while
    # still exercising two jit specializations in one sharded run
    batches, seen = [], set()
    for b in all_batches:
        if b.node_tokens.shape not in seen:
            seen.add(b.node_tokens.shape)
            batches.append(b)

    model = build_model(cfg, vocab)
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=4)
    state = create_train_state(model, optimizer, batches[0], cfg)
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    rng = jax.random.PRNGKey(0)

    s_plain = state
    losses_plain = []
    for b in batches:
        s_plain, m = train_step(s_plain, b, rng)
        losses_plain.append(float(m["loss_sum"]))

    mesh = make_mesh()
    s_shard = replicate(state, mesh)
    losses_shard = []
    for b in batches:
        s_shard, m = train_step(s_shard, shard_batch(b, mesh), rng)
        losses_shard.append(float(m["loss_sum"]))

    np.testing.assert_allclose(losses_plain, losses_shard, rtol=2e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_plain.params),
                     jax.tree_util.tree_leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-5)


def test_tp_rules_shard_only_divisible_tables():
    """tp_spec: path-suffix match + divisibility gate (mesh.py)."""
    from jax.sharding import PartitionSpec as P

    from isubgvqa_tpu.parallel.mesh import shard_state, tp_spec

    mesh = make_mesh(4, num_model=2)
    tree = {
        "question_encoder": {"token_embedding": {"embedding": np.zeros((16, 4))}},
        "logit_fc": {"kernel": np.zeros((8, 5)), "bias": np.zeros((5,))},
        "position_embedding": {"embedding": np.zeros((16, 4))},
        "odd": {"token_embedding": {"embedding": np.zeros((15, 4))}},
    }
    placed = shard_state(tree, mesh)
    def spec(x):
        return x.sharding.spec
    assert spec(placed["question_encoder"]["token_embedding"]["embedding"]) \
        == P("model", None)
    assert spec(placed["logit_fc"]["kernel"]) == P("model", None)
    assert spec(placed["logit_fc"]["bias"]) == P()          # no rule
    assert spec(placed["position_embedding"]["embedding"]) == P()
    assert spec(placed["odd"]["token_embedding"]["embedding"]) == P()  # 15 % 2
    # model=1 mesh: everything replicated (shard_state == replicate)
    mesh1 = make_mesh()
    p1 = shard_state(tree, mesh1)
    assert all(l.sharding.spec == P()
               for l in jax.tree_util.tree_leaves(p1))


def test_tp_sharded_step_matches_replicated(setup):
    """DPxTP (4x2 mesh, big tables + Adam moments row-sharded over
    `model`) runs the SAME jitted step as pure DP and matches it —
    GSPMD partitioning from placement alone (parallel/mesh.py
    TP_PARAM_RULES; cfg.model_parallel wiring in train/loop.py)."""
    from jax.sharding import PartitionSpec as P

    from isubgvqa_tpu.parallel.mesh import shard_state

    cfg, model, _, _, batch = setup
    # per-leaf optimizer, exactly as the Trainer builds it under TP
    # (train/loop.py flat=cfg.model_parallel<=1): Adam moments must
    # mirror each table's sharding, which a flat vector cannot
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=4, flat=False)
    state = create_train_state(model, optimizer, batch, cfg)
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    rng = jax.random.PRNGKey(0)

    mesh_dp = make_mesh()
    s1, m1 = train_step(replicate(state, mesh_dp),
                        shard_batch(batch, mesh_dp), rng)

    mesh_tp = make_mesh(4, num_model=2)
    state_tp = shard_state(state, mesh_tp)
    # the Trainer pins the output state to the input placement — the
    # partitioner otherwise re-replicates the updated tables
    # (train/loop.py:66-75)
    tp_shardings = jax.tree_util.tree_map(lambda x: x.sharding, state_tp)
    train_step = jax.jit(make_train_step(model, optimizer, cfg),
                         out_shardings=(tp_shardings, None))
    n_sharded = sum(
        1 for l in jax.tree_util.tree_leaves(state_tp)
        if getattr(l, "sharding", None) is not None
        and l.sharding.spec == P("model", None))
    # token_embedding + logit_fc kernel in params, mirrored in Adam
    # mu and nu: at least 6 leaves actually sharded
    assert n_sharded >= 6, f"TP rules matched only {n_sharded} leaves"
    s2, m2 = train_step(state_tp, shard_batch(batch, mesh_tp), rng)

    np.testing.assert_allclose(float(m1["loss_sum"]), float(m2["loss_sum"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["correct"]), float(m2["correct"]))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    # updated TP leaves keep their sharding (no silent re-replication)
    n_after = sum(
        1 for l in jax.tree_util.tree_leaves(s2)
        if getattr(l, "sharding", None) is not None
        and l.sharding.spec == P("model", None))
    assert n_after >= 6
