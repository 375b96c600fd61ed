"""Auxiliary components: distributed metrics, rewiring policies,
ratio top-k, profiling hooks."""

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.ops.topk_ratio import topk_per_graph
from isubgvqa_tpu.sampling.rewiring import (
    masked_softmax,
    rewire_global_directed,
    rewire_global_undirected,
    weighted_cross_entropy,
)
from isubgvqa_tpu.train.distributed_metrics import (
    MetricLogger,
    SmoothedValue,
    reduce_dict,
)
from isubgvqa_tpu.utils.profiling import StepProfiler, trace


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0
    assert v.global_avg == 2.5
    v.synchronize_between_processes()   # single process: identity
    assert v.global_avg == 2.5


def test_reduce_dict_single_process():
    d = reduce_dict({"a": 1.0, "b": 2.0})
    assert d == {"a": 1.0, "b": 2.0}


def test_metric_logger_log_every(capsys):
    ml = MetricLogger()
    for batch in ml.log_every(range(5), print_freq=2, header="t"):
        ml.update(loss=float(batch))
    out = capsys.readouterr().out
    assert "eta:" in out and "loss:" in out and "Total time" in out


def test_rewire_global_directed_topk():
    scores = jnp.array(np.random.default_rng(0).normal(size=(2, 5, 5, 1)),
                       jnp.float32)
    mask = rewire_global_directed(scores, k=3)
    assert mask.shape == scores.shape
    np.testing.assert_allclose(np.asarray(mask).reshape(2, -1).sum(-1), 3.0)


def test_rewire_global_undirected_symmetric():
    scores = jnp.array(np.random.default_rng(1).normal(size=(2, 6, 6, 1)),
                       jnp.float32)
    mask = np.asarray(rewire_global_undirected(scores, k=4))
    np.testing.assert_allclose(mask, mask.transpose(0, 2, 1, 3))
    # k upper-triangle picks -> 2k entries after symmetrization
    assert mask.reshape(2, -1).sum(-1).max() == 8.0


def test_rewire_avoids_existing_edges():
    scores = jnp.ones((1, 4, 4, 1), jnp.float32)
    adj = jnp.zeros((1, 4, 4), bool).at[0, 0, 1].set(True)
    mask = np.asarray(rewire_global_directed(scores, k=15, adj=adj))
    assert mask[0, 0, 1, 0] == 0.0


def test_masked_softmax_and_weighted_ce():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    m = jnp.array([[1.0, 1.0, 0.0]])
    p = np.asarray(masked_softmax(logits, m))
    assert p[0, 2] == 0.0
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)

    ce = weighted_cross_entropy(jnp.eye(3) * 10, jnp.arange(3),
                                jnp.array([1.0, 1.0, 0.0]))
    assert float(ce) < 0.1


def test_topk_per_graph_ratio_and_int(rng):
    scores = jnp.array(rng.normal(size=(2, 8)), jnp.float32)
    node_mask = jnp.array([[1] * 6 + [0] * 2, [1] * 4 + [0] * 4], bool)
    m_int = np.asarray(topk_per_graph(scores, 3, node_mask))
    np.testing.assert_allclose(m_int.sum(-1), [3, 3])
    m_ratio = np.asarray(topk_per_graph(scores, 0.5, node_mask))
    np.testing.assert_allclose(m_ratio.sum(-1), [3, 2])
    assert (m_int[:, 6:] == 0).all() or (m_int[1, 4:] == 0).all()


def test_step_profiler_and_trace(tmp_path):
    p = StepProfiler()
    for _ in range(3):
        p.step()
    s = p.summary()
    assert "mean_s" in s
    with trace(None):   # disabled: no-op
        pass
