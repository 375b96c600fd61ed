"""Unit tests for the segment-op kernel library against numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    segment_normalize,
    to_dense_batch,
    from_dense_batch,
    dense_topk_mask,
)


def make_segments(rng, n=50, num_segments=5, dim=7):
    data = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.sort(rng.integers(0, num_segments, size=n)).astype(np.int32)
    mask = rng.random(n) > 0.2
    return data, ids, mask


def test_segment_sum_matches_numpy(rng):
    data, ids, mask = make_segments(rng)
    out = segment_sum(jnp.array(data), jnp.array(ids), 5, mask=jnp.array(mask))
    ref = np.zeros((5, data.shape[1]), np.float32)
    for i in range(len(ids)):
        if mask[i]:
            ref[ids[i]] += data[i]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_mean_matches_numpy(rng):
    data, ids, mask = make_segments(rng)
    out = segment_mean(jnp.array(data), jnp.array(ids), 5, mask=jnp.array(mask))
    for s in range(5):
        sel = (ids == s) & mask
        if sel.sum() == 0:
            np.testing.assert_allclose(np.asarray(out[s]), 0.0)
        else:
            np.testing.assert_allclose(
                np.asarray(out[s]), data[sel].mean(0), rtol=1e-5, atol=1e-5
            )


def test_segment_mean_empty_segment_is_zero():
    data = jnp.ones((3, 2))
    ids = jnp.array([0, 0, 2])
    out = segment_mean(data, ids, 4)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)
    np.testing.assert_allclose(np.asarray(out[3]), 0.0)


def test_segment_max(rng):
    data, ids, mask = make_segments(rng)
    out = segment_max(jnp.array(data), jnp.array(ids), 5, mask=jnp.array(mask))
    for s in range(5):
        sel = (ids == s) & mask
        if sel.sum():
            np.testing.assert_allclose(
                np.asarray(out[s]), data[sel].max(0), rtol=1e-6
            )


def test_segment_softmax_sums_to_one(rng):
    data, ids, mask = make_segments(rng, dim=1)
    logits = jnp.array(data[:, 0])
    p = segment_softmax(logits, jnp.array(ids), 5, mask=jnp.array(mask))
    p = np.asarray(p)
    assert np.all(p[~mask] == 0.0)
    for s in range(5):
        sel = (ids == s) & mask
        if sel.sum():
            np.testing.assert_allclose(p[sel].sum(), 1.0, rtol=1e-5)


def test_segment_softmax_matches_numpy(rng):
    logits = rng.normal(size=12).astype(np.float32) * 5
    ids = np.array([0] * 4 + [1] * 8, np.int32)
    p = segment_softmax(jnp.array(logits), jnp.array(ids), 2)
    ref0 = np.exp(logits[:4] - logits[:4].max())
    ref0 /= ref0.sum()
    np.testing.assert_allclose(np.asarray(p[:4]), ref0, rtol=1e-5)


def test_segment_softmax_fully_masked_segment_no_nan():
    logits = jnp.array([1.0, 2.0, 3.0])
    ids = jnp.array([0, 0, 1])
    mask = jnp.array([True, True, False])
    p = segment_softmax(logits, ids, 2, mask=mask)
    assert not np.any(np.isnan(np.asarray(p)))
    assert np.asarray(p)[2] == 0.0


def test_segment_softmax_gradient_flows(rng):
    logits = jnp.array(rng.normal(size=6).astype(np.float32))
    ids = jnp.array([0, 0, 0, 1, 1, 1])

    def loss(x):
        return jnp.sum(segment_softmax(x, ids, 2) ** 2)

    g = jax.grad(loss)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    # softmax gradient within a segment sums to ~0 for a linear functional
    g_lin = jax.grad(lambda x: jnp.sum(segment_softmax(x, ids, 2)))(logits)
    np.testing.assert_allclose(np.asarray(g_lin), 0.0, atol=1e-6)


def test_segment_normalize_graphnorm_semantics(rng):
    data = rng.normal(loc=3.0, scale=2.0, size=(20, 4)).astype(np.float32)
    ids = np.array([0] * 12 + [1] * 8, np.int32)
    out, mean, var = segment_normalize(jnp.array(data), jnp.array(ids), 2)
    out = np.asarray(out)
    for s, sl in [(0, slice(0, 12)), (1, slice(12, 20))]:
        np.testing.assert_allclose(out[sl].mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(out[sl].std(0), 1.0, atol=1e-3)


def test_to_dense_and_back(rng):
    # two graphs: 3 nodes and 2 nodes, padded flat length 8
    flat = jnp.arange(8, dtype=jnp.float32) + 1.0
    seg = jnp.array([0, 0, 0, 1, 1, 2, 2, 2])  # ids >= 2 are padding
    pos = jnp.array([0, 1, 2, 0, 1, 0, 1, 2])
    dense, valid = to_dense_batch(flat, seg, pos, num_segments=2, max_per_segment=4)
    assert dense.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(dense[0]), [1, 2, 3, 0])
    np.testing.assert_allclose(np.asarray(dense[1]), [4, 5, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(valid), [[1, 1, 1, 0], [1, 1, 0, 0]]
    )
    node_mask = seg < 2
    back = from_dense_batch(dense, seg, pos, valid_mask=node_mask)
    np.testing.assert_allclose(np.asarray(back[:5]), np.asarray(flat[:5]))
    np.testing.assert_allclose(np.asarray(back[5:]), 0.0)


def test_dense_topk_mask_basic():
    scores = jnp.array([[0.1, 5.0, 3.0, -1.0], [1.0, 1.0, 0.0, 2.0]])
    m = dense_topk_mask(scores, 2)
    np.testing.assert_allclose(np.asarray(m[0]), [0, 1, 1, 0])
    # ties at threshold are all selected (reference semantics)
    np.testing.assert_allclose(np.asarray(m[1]), [1, 1, 0, 1])


def test_dense_topk_mask_k_geq_n():
    scores = jnp.zeros((2, 3))
    np.testing.assert_allclose(np.asarray(dense_topk_mask(scores, 5)), 1.0)


def test_ops_jit_stable(rng):
    data, ids, mask = make_segments(rng)
    f = jax.jit(lambda d, i, m: segment_softmax(d[:, 0], i, 5, mask=m))
    a = f(jnp.array(data), jnp.array(ids), jnp.array(mask))
    b = segment_softmax(jnp.array(data[:, 0]), jnp.array(ids), 5, mask=jnp.array(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
