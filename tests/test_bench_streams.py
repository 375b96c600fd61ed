"""bench.py batch-stream generation: the axon tunnel dedups identical
executions, so every timed batch must be pairwise-distinct — including
when a bucket's member count is an exact multiple of the batch size
(the composition-wrap scheme emitted byte-identical batches there)."""

import numpy as np
import pytest

from bench import _stream_is_distinct, build_bucket_streams
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)


def _setup(size):
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(16)
    ds = SyntheticGQA(vocab, answers, size=size, seed=0)
    tok = HashWordTokenizer(max_len=12)
    collators = {
        (32, 12): Collator(tok, BucketSpec(4, max_nodes_per_graph=32,
                                           max_edges_per_graph=160,
                                           question_len=12), vocab=vocab),
    }
    return ds, collators


def test_streams_distinct_when_members_equal_batch_size():
    """members == batch size: exactly the case where the old wraparound
    produced 5 identical batches."""
    ds, collators = _setup(size=4)
    streams, weights = build_bucket_streams(ds, collators, batch_size=4,
                                            min_timed=4)
    (batches,) = streams.values()
    assert len(batches) == 5
    assert _stream_is_distinct(batches)
    assert list(weights.values()) == [1.0]


def test_streams_distinct_when_members_below_batch_size():
    """2 members at batch 4: only 2 distinct rotations exist, but
    with-replacement draws give up to 2^4 compositions."""
    ds, collators = _setup(size=2)
    streams, _ = build_bucket_streams(ds, collators, batch_size=4,
                                      min_timed=4)
    (batches,) = streams.values()
    assert _stream_is_distinct(batches)


def test_single_member_bucket_is_flagged_not_silently_blended():
    """1 member cannot produce distinct batches — the helper that the
    timing loop uses to set ``distinct_inputs: false`` must detect it."""
    ds, collators = _setup(size=1)
    streams, _ = build_bucket_streams(ds, collators, batch_size=4,
                                      min_timed=4)
    (batches,) = streams.values()
    assert not _stream_is_distinct(batches)


def test_time_stream_checked_retimes_impossible_readings(monkeypatch):
    """A reading implying > 95% of nominal peak is a tunnel artifact
    (dedup/caching): the guard re-times once and keeps the SLOWER,
    physically-possible measurement."""
    import bench

    readings = [1.0, 50.0]  # first read impossibly fast, re-time sane
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: readings.pop(0))
    # rate implied by the 1 ms read = flops / 1e-3 s = 500x peak
    flops = bench.NOMINAL_PEAK_TFLOPS * 1e12 * 0.5
    ms, retimed = bench._time_stream_checked(None, None, flops)
    assert retimed
    assert ms == 50.0
    assert not readings  # re-time actually ran


def test_time_stream_checked_passes_plausible_readings(monkeypatch):
    import bench

    calls = []

    def fake(run_one, batches):
        calls.append(1)
        return 100.0

    monkeypatch.setattr(bench, "_time_stream", fake)
    # implied rate = flops / 0.1 s = 0.1 * peak -> plausible, no re-time
    flops = bench.NOMINAL_PEAK_TFLOPS * 1e12 * 0.01
    ms, retimed = bench._time_stream_checked(None, None, flops)
    assert ms == 100.0 and not retimed and len(calls) == 1


def test_time_stream_checked_zero_flops_disables_guard(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: 0.001)
    ms, retimed = bench._time_stream_checked(None, None, 0.0)
    assert ms == 0.001 and not retimed


def test_streams_deterministic_across_calls():
    """Seeded per bucket: re-running the bench times the same stream."""
    ds, collators = _setup(size=10)
    s1, _ = build_bucket_streams(ds, collators, batch_size=4, min_timed=4)
    s2, _ = build_bucket_streams(ds, collators, batch_size=4, min_timed=4)
    for k in s1:
        for b1, b2 in zip(s1[k], s2[k]):
            np.testing.assert_array_equal(np.asarray(b1.node_tokens),
                                          np.asarray(b2.node_tokens))
            np.testing.assert_array_equal(np.asarray(b1.qst_tokens),
                                          np.asarray(b2.qst_tokens))


# ------------------------------------------------------- congestion guard

def test_congestion_guard_flags_persistently_slow_bucket(
        monkeypatch, tmp_path):
    """Reading > 1.5x the stored last-healthy time: re-time once; if
    still slow, flag congested and do NOT poison the healthy profile."""
    import json

    import bench

    prof_path = tmp_path / "profile.json"
    monkeypatch.setenv("ISUBGVQA_BENCH_PROFILE", str(prof_path))
    readings = [30.0, 28.0]          # congestion survives the re-time
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: readings.pop(0))
    profile = {"k": 10.0}
    ms, retimed, congested = bench._time_stream_guarded(
        None, None, 0.0, profile, "k")
    assert ms == 28.0 and retimed and congested
    assert profile["k"] == 10.0                  # healthy floor kept
    assert not prof_path.exists() or \
        json.loads(prof_path.read_text()).get("k", 10.0) == 10.0


def test_congestion_guard_recovers_on_retime(monkeypatch, tmp_path):
    import bench

    monkeypatch.setenv("ISUBGVQA_BENCH_PROFILE", str(tmp_path / "p.json"))
    readings = [30.0, 11.0]          # transient episode; re-time healthy
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: readings.pop(0))
    profile = {"k": 10.0}
    ms, retimed, congested = bench._time_stream_guarded(
        None, None, 0.0, profile, "k")
    assert ms == 11.0 and retimed and not congested
    assert profile["k"] == 10.0


def test_congestion_guard_seeds_and_improves_profile(
        monkeypatch, tmp_path):
    import json

    import bench

    prof_path = tmp_path / "profile.json"
    monkeypatch.setenv("ISUBGVQA_BENCH_PROFILE", str(prof_path))
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: 20.0)
    profile = {}
    ms, retimed, congested = bench._time_stream_guarded(
        None, None, 0.0, profile, "k")
    assert (ms, retimed, congested) == (20.0, False, False)
    assert profile["k"] == 20.0
    assert json.loads(prof_path.read_text())["k"] == 20.0
    # a faster later run lowers the floor
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: 15.0)
    ms, _, _ = bench._time_stream_guarded(None, None, 0.0, profile, "k")
    assert profile["k"] == 15.0


def test_congestion_guard_disabled_profile(monkeypatch):
    import bench

    monkeypatch.setenv("ISUBGVQA_BENCH_PROFILE", "0")
    assert bench._profile_path() == ""
    assert bench._load_profile() == {}
    monkeypatch.setattr(bench, "_time_stream",
                        lambda run_one, batches: 20.0)
    profile = {}
    ms, retimed, congested = bench._time_stream_guarded(
        None, None, 0.0, profile, "")
    assert (ms, retimed, congested) == (20.0, False, False)
    assert profile == {}         # nothing stored for an empty key


# ------------------------------------- dispatch-invariant FLOPs accounting

def test_multistep_flops_accounting_is_dispatch_invariant(monkeypatch):
    """FLOPs/question must not depend on the dispatch mode: the K
    scanned updates of the multistep program run exactly the
    single-step math K times (round-3 read the scanned program's cost
    analysis, which under-counts the scan body: 3,097 vs 5,700
    MFLOPs/q for identical math)."""
    import dataclasses

    import bench
    from isubgvqa_tpu.config import Config

    def tiny_cfg(sampler, batch_size, dtype, node_caps=(16, 32),
                 kernel_pack=None):
        return Config(
            batch_size=batch_size, compute_dtype="float32",
            sampler_type=sampler, sample_k=3, question_len=12,
            max_nodes_per_graph=32, max_edges_per_graph=128,
            bucket_node_caps=tuple(node_caps),
            bucket_question_lens=(12,), text_vocab_size=512,
            num_answers=16, synthetic=True, meta_dir="/nonexistent",
            use_pallas=False, kernel_pack=None)

    monkeypatch.setattr(bench, "_cfg", tiny_cfg)
    # identical iters -> identical dataset -> identical bucket weights;
    # only the dispatch mode differs (multistep forces iters>=3K=6)
    r1 = bench.bench_train_step("gumbel", batch_size=4, iters=6,
                                node_caps=(16, 32), multistep=1)
    r2 = bench.bench_train_step("gumbel", batch_size=4, iters=6,
                                node_caps=(16, 32), multistep=2)
    assert r1["flops_per_question"] > 0
    # identical per-question math -> identical accounting (exact: both
    # lower the same single-step program)
    assert r2["flops_per_question"] == pytest.approx(
        r1["flops_per_question"], rel=1e-6)
