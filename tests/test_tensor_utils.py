"""Rewiring-policy support utilities (``sampling/methods/
tensor_utils.py:8-47,91-124``) on the dense TPU layout."""

import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.sampling import (batch_repeat_edge_index,
                                   batched_edge_index_to_batched_adj,
                                   non_merge_coalesce)


def test_batched_adj_strips_loops_and_readds_diagonal():
    """tensor_utils.py:27-39: existing self-loops removed, a full
    diagonal re-added for valid nodes."""
    # graph 0: 3 valid nodes, edges 0->1, 1->1 (loop), 2->0
    src = jnp.array([[0, 1, 2, 0], [0, 0, 0, 0]])
    dst = jnp.array([[1, 1, 0, 0], [1, 0, 0, 0]])
    emask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    nmask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)

    original, rewire = batched_edge_index_to_batched_adj(
        src, dst, emask, nmask)
    original, rewire = np.asarray(original), np.asarray(rewire)

    assert original[0, 0, 1] and original[0, 1, 1] and original[0, 2, 0]
    assert not original[0, 0, 0]               # padded edge dropped
    # rewire mask: non-loop edges + full valid diagonal
    assert rewire[0, 0, 1] and rewire[0, 2, 0]
    assert rewire[0, 0, 0] and rewire[0, 1, 1] and rewire[0, 2, 2]
    assert not rewire[0, 3, 3]                 # invalid node: no diagonal
    # graph 1: only nodes 0, 1 valid; 0->0 loop stays via diagonal only
    assert rewire[1, 0, 0] and rewire[1, 1, 1] and rewire[1, 0, 1]
    assert not rewire[1, 2, 2]


def test_non_merge_coalesce_sorts_without_merging():
    """tensor_utils.py:91-114: lexicographic (row, col) sort carrying
    attr/weight; duplicates preserved; padded edges pushed last."""
    src = jnp.array([2, 0, 1, 0, 0])
    dst = jnp.array([0, 1, 0, 1, 9])
    attr = jnp.array([10.0, 20.0, 30.0, 40.0, 50.0])
    w = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    emask = jnp.array([1, 1, 1, 1, 0], bool)

    s, d, a, ww, m = non_merge_coalesce(src, dst, attr, w, num_nodes=10,
                                        edge_mask=emask)
    np.testing.assert_array_equal(np.asarray(s), [0, 0, 1, 2, 0])
    np.testing.assert_array_equal(np.asarray(d), [1, 1, 0, 0, 9])
    # duplicate (0,1) edges keep both attrs, original order (stable)
    np.testing.assert_allclose(np.asarray(a), [20.0, 40.0, 30.0, 10.0, 50.0])
    np.testing.assert_allclose(np.asarray(ww), [2.0, 4.0, 3.0, 1.0, 5.0])
    np.testing.assert_array_equal(np.asarray(m), [1, 1, 1, 1, 0])


def test_non_merge_coalesce_sort_by_col():
    src = jnp.array([2, 0, 1])
    dst = jnp.array([0, 1, 0])
    s, d, a, w = non_merge_coalesce(src, dst, None, None, num_nodes=5,
                                    sort_by_row=False)
    np.testing.assert_array_equal(np.asarray(d), [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(s), [1, 2, 0])
    assert a is None and w is None


def test_batch_repeat_edge_index():
    """tensor_utils.py:117-124."""
    ei = jnp.array([[0, 1], [1, 2]])
    out = np.asarray(batch_repeat_edge_index(ei, num_nodes=3, repeats=3))
    np.testing.assert_array_equal(
        out, [[0, 1, 3, 4, 6, 7], [1, 2, 4, 5, 7, 8]])
    # repeats=1 is the identity (reference short-circuit)
    out1 = batch_repeat_edge_index(ei, num_nodes=3, repeats=1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ei))
