"""Dense per-graph ops vs. the flat segment reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.ops.dense_graph import (
    aggregate_edges,
    edge_onehot,
    edge_softmax,
    gather_nodes,
    graph_norm_dense,
    masked_mean,
    node_softmax,
)
from isubgvqa_tpu.ops.segment import segment_softmax, segment_sum


def make_graph_batch(rng, b=3, n=8, e=16, f=5):
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    n_real = rng.integers(2, n + 1, size=b)
    e_real = rng.integers(1, e + 1, size=b)
    node_mask = np.zeros((b, n), bool)
    edge_mask = np.zeros((b, e), bool)
    src = np.zeros((b, e), np.int32)
    dst = np.zeros((b, e), np.int32)
    for g in range(b):
        node_mask[g, :n_real[g]] = True
        edge_mask[g, :e_real[g]] = True
        src[g, :e_real[g]] = rng.integers(0, n_real[g], e_real[g])
        dst[g, :e_real[g]] = rng.integers(0, n_real[g], e_real[g])
    return x, src, dst, node_mask, edge_mask


def test_gather_matches_indexing(rng):
    x, src, dst, nm, em = make_graph_batch(rng)
    out_take = gather_nodes(jnp.array(x), jnp.array(src), via="take")
    out_oh = gather_nodes(jnp.array(x), jnp.array(src), via="onehot")
    ref = np.stack([x[g][src[g]] for g in range(3)])
    np.testing.assert_allclose(np.asarray(out_take), ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_oh), ref, rtol=1e-5, atol=1e-5)


def test_aggregate_matches_segment_sum(rng):
    x, src, dst, nm, em = make_graph_batch(rng)
    b, n, e = 3, 8, 16
    msg = rng.normal(size=(b, e, 5)).astype(np.float32)
    oh = edge_onehot(jnp.array(dst), n, jnp.array(em), dtype=jnp.float32)
    out = aggregate_edges(jnp.array(msg), oh)
    # flat segment reference
    flat_ids = (np.arange(b)[:, None] * n + dst).reshape(-1)
    flat_msg = msg.reshape(-1, 5) * em.reshape(-1, 1)
    ref = np.asarray(segment_sum(jnp.array(flat_msg), jnp.array(flat_ids),
                                 b * n)).reshape(b, n, 5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_edge_softmax_matches_segment_softmax(rng):
    x, src, dst, nm, em = make_graph_batch(rng)
    b, n, e, h = 3, 8, 16, 4
    logits = (rng.normal(size=(b, e, h)) * 3).astype(np.float32)
    oh = edge_onehot(jnp.array(dst), n, jnp.array(em), dtype=jnp.float32)
    alpha = edge_softmax(jnp.array(logits), jnp.array(dst), oh, jnp.array(em))
    flat_ids = (np.arange(b)[:, None] * n + dst).reshape(-1)
    ref = np.asarray(segment_softmax(
        jnp.array(logits.reshape(-1, h)), jnp.array(flat_ids), b * n,
        mask=jnp.array(em.reshape(-1)))).reshape(b, e, h)
    np.testing.assert_allclose(np.asarray(alpha), ref, rtol=1e-4, atol=1e-5)
    # masked edges -> exactly zero
    assert (np.asarray(alpha)[~em] == 0).all()


def test_edge_softmax_grad_finite(rng):
    x, src, dst, nm, em = make_graph_batch(rng)
    oh = edge_onehot(jnp.array(dst), 8, jnp.array(em), dtype=jnp.float32)

    def loss(l):
        a = edge_softmax(l, jnp.array(dst), oh, jnp.array(em))
        return jnp.sum(a ** 2)

    g = jax.grad(loss)(jnp.array(rng.normal(size=(3, 16, 4)).astype(np.float32)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_node_softmax(rng):
    b, n = 3, 8
    nm = np.zeros((b, n), bool)
    nm[:, :5] = True
    logits = rng.normal(size=(b, n)).astype(np.float32)
    p = np.asarray(node_softmax(jnp.array(logits), jnp.array(nm)))
    np.testing.assert_allclose(p[:, :5].sum(-1), 1.0, rtol=1e-5)
    assert (p[:, 5:] == 0).all()


def test_masked_mean(rng):
    x = rng.normal(size=(2, 6, 3)).astype(np.float32)
    m = np.array([[1, 1, 1, 0, 0, 0], [1, 0, 0, 0, 0, 0]], bool)
    out = np.asarray(masked_mean(jnp.array(x), jnp.array(m), axis=1))
    np.testing.assert_allclose(out[0], x[0, :3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(out[1], x[1, :1].mean(0), rtol=1e-5)


def test_graph_norm_dense_standardizes(rng):
    b, n, c = 2, 10, 4
    x = (rng.normal(size=(b, n, c)) * 2 + 3).astype(np.float32)
    nm = np.ones((b, n), bool)
    nm[1, 6:] = False
    out = np.asarray(graph_norm_dense(
        jnp.array(x), jnp.array(nm), jnp.ones(c), jnp.zeros(c), jnp.ones(c)))
    np.testing.assert_allclose(out[0].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0].std(0), 1.0, atol=1e-3)
    np.testing.assert_allclose(out[1, :6].mean(0), 0.0, atol=1e-5)
    assert (out[1, 6:] == 0).all()
