"""Explanation runner + token-cooccurrence metrics + data bundle."""

import dataclasses

import numpy as np
import pytest

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data.build import build_datasets
from isubgvqa_tpu.explain import (
    compute_ans_token_cooccurrence,
    compute_qst_token_cooccurrence,
    compute_text_expl_token_cooccurrence,
    run_token_coo_exp,
)
from isubgvqa_tpu.models.build import build_model
from isubgvqa_tpu.train.loop import Trainer

from test_model import small_cfg


def test_token_coo_metrics_reference_semantics():
    objects = ["cat", "dog", "tree"]
    mask = [1.0, 0.0, 1.0]
    # answer-token coo: answer in masked objects and not a color question
    val, n = compute_ans_token_cooccurrence(mask, "cat", "cat", objects,
                                            "where is the cat?")
    assert (val, n) == (1.0, 1)
    val, n = compute_ans_token_cooccurrence(mask, "dog", "dog", objects,
                                            "where is the dog?")
    assert (val, n) == (0.0, 0)
    # color questions are excluded (token_coo_fns.py:8)
    val, n = compute_ans_token_cooccurrence(mask, "cat", "cat", objects,
                                            "what color is the cat?")
    assert np.isnan(val)

    # question-token coo: fraction of question tokens that survive
    val, n = compute_qst_token_cooccurrence(mask, objects,
                                            "is the cat near the dog?")
    assert n == 2 and val == 0.5
    val, n = compute_qst_token_cooccurrence(mask, objects, "hello there?")
    assert np.isnan(val)

    # text-explanation coo
    val = compute_text_expl_token_cooccurrence(mask, objects,
                                               ["cat", "dog"], "q?")
    assert val == 0.5
    assert np.isnan(compute_text_expl_token_cooccurrence(mask, objects,
                                                         ["sky"], "q?"))


@pytest.fixture(scope="module")
def bundle():
    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=32, batch_size=4,
        eval_batch_factor=2, meta_dir="", epochs=0)
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    return cfg, data


def test_build_datasets_synthetic(bundle):
    cfg, data = bundle
    assert set(data.datasets) == {"train", "dev", "testdev"}
    assert len(data.datasets["train"]) == 32
    # eval collators use the reference's batch x4 (here x2)
    assert data.collators["dev"].spec.batch_size == 8


def test_run_token_coo_exp_end_to_end(bundle, capsys):
    cfg, data = bundle
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)
    res = run_token_coo_exp(model=model, state=trainer.state, data=data,
                            cfg=cfg, split="dev", max_batches=1)
    out = capsys.readouterr().out
    assert "Accuracy:" in out
    assert res.num_samples == 8
    assert 0.0 <= res.accuracy <= 1.0


def test_fast_metrics_match_oracle():
    """The vectorized metric path (explain/runner.py:_accumulate_fast)
    must reproduce the per-sample oracle loop's metric sums exactly —
    including accuracy-AT and the co-occurrence branches, which need
    answer strings that actually appear among scene-graph node labels
    (run_token_coo.py:145-185)."""
    import numpy as _np

    from isubgvqa_tpu.data.gqa import AnswerMap
    from isubgvqa_tpu.data.synthetic import SyntheticGQA

    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=64, batch_size=4,
        eval_batch_factor=2, meta_dir="", epochs=0, text_sampling=True)
    data = build_datasets(cfg)
    # answers = the vocab's object names, so gt/pred strings occur as
    # node labels and exercise every metric branch
    names = [t for t in data.vocab.itos if t.startswith("obj")]
    l2a = (names + [f"ans{i}" for i in range(cfg.num_answers)])
    l2a = l2a[:cfg.num_answers]
    answers = AnswerMap({a: i for i, a in enumerate(l2a)}, l2a)
    dev = SyntheticGQA(data.vocab, answers, size=64, seed=1, split="valid")
    data = dataclasses.replace(data, answers=answers,
                               datasets={**data.datasets, "dev": dev})
    cfg = dataclasses.replace(cfg, num_answers=len(answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)

    kw = dict(model=model, state=trainer.state, data=data, cfg=cfg,
              split="dev", seed=5)
    slow = run_token_coo_exp(**kw, fast_metrics=False)
    fast = run_token_coo_exp(**kw, fast_metrics=True)

    assert fast.sums.keys() == slow.sums.keys()
    for k, v in slow.sums.items():
        assert fast.sums[k] == pytest.approx(v, abs=1e-9), k
    # the interesting branches must actually have fired
    assert slow.sums["acc_n"] > 0
    assert slow.sums["acc_at_n"] > 0, "accuracy-AT branch never exercised"
    assert slow.sums["qst_n"] > 0, "qst-coo branch never exercised"
    assert not _np.isnan(fast.accuracy)


def test_sharded_explain_recombines():
    """Two explicit shards each see half the dev set; their metric
    sums combine exactly to the unsharded run's (the multi-host
    explain pattern — each host does 1/N work, ``reduce_dict`` then
    restores the full-set numbers).  Uses the deterministic hard-
    sigmoid masking path (use_topk=False): the noisy-eval samplers
    draw batch-shaped noise, so per-sample outputs would legitimately
    differ with batch composition."""
    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=32, batch_size=4,
        eval_batch_factor=2, meta_dir="", epochs=0, use_topk=False)
    data = build_datasets(cfg)
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)

    kw = dict(model=model, state=trainer.state, data=data, cfg=cfg,
              split="dev", seed=7)
    full = run_token_coo_exp(**kw)
    shard0 = run_token_coo_exp(**kw, shard_index=0, num_shards=2)
    shard1 = run_token_coo_exp(**kw, shard_index=1, num_shards=2)

    assert shard0.num_samples + shard1.num_samples == full.num_samples
    combined = {k: shard0.sums[k] + shard1.sums[k] for k in full.sums}
    for k, v in full.sums.items():
        assert combined[k] == pytest.approx(v, abs=1e-9), k


def test_sharded_explain_recombines_unbucketed():
    """The non-bucketed fallback path (single collator) must partition
    exactly too: with an odd dev set, a wrap-padded duplicate sample
    would double-count into the reduced sums (iterate_batches
    pad_shards=False, explain/runner.py)."""
    cfg = dataclasses.replace(
        small_cfg(), synthetic=True, synthetic_size=28, batch_size=2,
        eval_batch_factor=1, meta_dir="", epochs=0, use_topk=False,
        bucket_node_caps=(), bucket_question_lens=())
    data = build_datasets(cfg)
    assert len(data.bucket_collators["dev"]) == 1   # fallback branch
    assert len(data.datasets["dev"]) == 7           # odd: pad would dup
    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)

    kw = dict(model=model, state=trainer.state, data=data, cfg=cfg,
              split="dev", seed=7)
    full = run_token_coo_exp(**kw)
    shard0 = run_token_coo_exp(**kw, shard_index=0, num_shards=2)
    shard1 = run_token_coo_exp(**kw, shard_index=1, num_shards=2)

    assert full.num_samples == 7
    assert shard0.num_samples + shard1.num_samples == full.num_samples
    combined = {k: shard0.sums[k] + shard1.sums[k] for k in full.sums}
    for k, v in full.sums.items():
        assert combined[k] == pytest.approx(v, abs=1e-9), k
