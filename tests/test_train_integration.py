"""Training integration: the jitted train step reduces the loss on the
synthetic fixture, optimizer/schedule behave, eval runs, checkpoints
round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.data.batching import iterate_batches
from isubgvqa_tpu.models.build import build_model
from isubgvqa_tpu.train.schedule import make_optimizer, warmup_exponential_schedule
from isubgvqa_tpu.train.state import create_train_state
from isubgvqa_tpu.train.steps import make_eval_step, make_train_step

from test_model import small_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        small_cfg(), batch_size=8, lr=3e-4, warmup_epochs=0,
        sampler_type="gumbel", sample_k=4)
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=32, seed=0)
    spec = BucketSpec(batch_size=8, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=12)
    coll = Collator(HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                                      max_len=12), spec, vocab=vocab)
    batches = [b for b, _ in iterate_batches(ds, coll, drop_last=True)]
    model = build_model(cfg, vocab)
    optimizer = make_optimizer(cfg.lr, steps_per_epoch=4, warmup_epochs=0,
                               gamma=1.0, grad_clip_norm=cfg.grad_clip_norm)
    state = create_train_state(model, optimizer, batches[0], cfg)
    return cfg, model, optimizer, state, batches


def test_train_step_reduces_loss(setup):
    cfg, model, optimizer, state, batches = setup
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    rng = jax.random.PRNGKey(0)
    losses = []
    for step in range(16):
        state, metrics = train_step(state, batches[step % len(batches)], rng)
        losses.append(float(metrics["loss_sum"]) / max(float(metrics["count"]), 1))
    assert np.isfinite(losses).all()
    # optimizing 16 steps on 4 repeated batches must cut CE clearly
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 0.3, losses


def test_grad_norm_clipped(setup):
    cfg, model, optimizer, state, batches = setup
    train_step = jax.jit(make_train_step(model, optimizer, cfg))
    _, metrics = train_step(state, batches[0], jax.random.PRNGKey(0))
    assert float(metrics["grad_norm"]) > 0.0


def test_eval_step_runs_and_masks_padding(setup):
    cfg, model, optimizer, state, batches = setup
    eval_step = jax.jit(make_eval_step(model, cfg))
    batch = batches[0]
    # zero out half the sample mask: metrics must count only the rest
    sm = np.asarray(batch.sample_mask).copy()
    sm[4:] = 0.0
    batch = batch.replace(sample_mask=jnp.asarray(sm))
    m = jax.device_get(eval_step(state, batch, jax.random.PRNGKey(0)))
    assert float(m["count"]) == 4.0


def test_schedule_warmup_and_decay():
    sched = warmup_exponential_schedule(
        base_lr=1e-3, steps_per_epoch=10, warmup_epochs=2,
        warmup_start_lr=1e-6, gamma=0.5)
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(10)) == pytest.approx((1e-6 + 1e-3) / 2, rel=1e-3)
    assert float(sched(20)) == pytest.approx(1e-3)
    assert float(sched(30)) == pytest.approx(5e-4)
    assert float(sched(40)) == pytest.approx(2.5e-4)


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, optimizer, state, batches = setup
    from isubgvqa_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path))
    mgr.save("checkpoint", state, epoch=7, cfg=cfg)
    restored, next_epoch, ckpt_cfg = mgr.restore("checkpoint", state)
    assert next_epoch == 8
    assert ckpt_cfg.sampler_type == cfg.sampler_type
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sharded_validation_recombines_to_full():
    """Per-process sharded validation (DistributedSampler parity):
    two shards' metrics, count-weighted, equal the unsharded run on
    deterministic eval (thresholds 1.0, buckets off so both paths use
    identical static shapes)."""
    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.train.loop import Trainer

    cfg = dataclasses.replace(
        small_cfg(), batch_size=8, epochs=1, synthetic=True,
        synthetic_size=64, meta_dir="", mgat_masks=(1.0,) * 4,
        sampler_type=None, sample_k=None, eval_batch_factor=1,
        bucket_node_caps=(), bucket_question_lens=())
    data = build_datasets(cfg)
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)

    def run(shard_index, num_shards):
        trainer.shard_index = shard_index
        trainer.num_shards = num_shards
        trainer.rng = jax.random.PRNGKey(0)
        return trainer.validate_epoch(0)

    acc_full, loss_full = run(0, 1)
    acc0, loss0 = run(0, 2)
    acc1, loss1 = run(1, 2)
    # dev split is 16 samples -> 8 per shard, equal counts
    np.testing.assert_allclose((acc0 + acc1) / 2, acc_full, atol=1e-4)
    np.testing.assert_allclose((loss0 + loss1) / 2, loss_full, rtol=1e-5)


def test_profile_dir_produces_trace(tmp_path):
    """--profile_dir wiring (SURVEY §5 tracing): a 1-epoch fit with
    cfg.profile_dir set must write a jax.profiler trace there."""
    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.train.loop import Trainer

    prof_dir = tmp_path / "trace"
    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=16, meta_dir="",
        batch_size=8, epochs=1, output_dir=str(tmp_path / "out"),
        profile_dir=str(prof_dir))   # batch divisible by the 8-dev mesh
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    Trainer(cfg, model, data).fit()
    trace_files = list(prof_dir.rglob("*"))
    assert any(f.is_file() for f in trace_files), \
        "profile_dir set but no trace captured"


def test_trainer_model_parallel_wiring(tmp_path):
    """cfg.model_parallel=2 -> (4 data x 2 model) mesh, TP-sharded
    tables survive a full fit() epoch (train/loop.py pins the step's
    out_shardings; placement rules in parallel/mesh.py)."""
    from jax.sharding import PartitionSpec as P

    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.train.loop import Trainer

    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=16, meta_dir="",
        batch_size=8, epochs=1, model_parallel=2,
        general_hidden_dim=32, text_emb_dim=64,
        output_dir=str(tmp_path / "out"),
        bucket_node_caps=(), bucket_question_lens=())
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}

    def tp_leaves(state):
        return sum(1 for l in jax.tree_util.tree_leaves(state)
                   if getattr(l, "sharding", None) is not None
                   and l.sharding.spec == P("model", None))

    assert tp_leaves(trainer.state) >= 6
    trainer.fit()
    assert tp_leaves(trainer.state) >= 6, \
        "TP placement lost across train steps"
