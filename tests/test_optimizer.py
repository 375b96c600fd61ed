"""The flat single-vector optimizer (train/schedule.py).

Pins that the performance rework — ``optax.flatten`` over the whole
chain plus the one-reduction ``skip_nonfinite`` wrapper — is a pure
reformulation: identical updates to the original per-leaf
``apply_if_finite(chain(clip, adam))`` stack on finite gradients, and
identical GradScaler-skip semantics (``train_epoch.py:113-118``) on
inf/NaN gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from isubgvqa_tpu.train.schedule import (make_optimizer, skip_nonfinite,
                                         warmup_exponential_schedule)


def _tree(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "emb": {"table": jax.random.normal(k[0], (64, 16))},
        "mlp": {"w": jax.random.normal(k[1], (16, 8)),
                "b": jax.random.normal(k[2], (8,))},
        "scale": jax.random.normal(k[3], ()),
    }


def _legacy_optimizer(base_lr, steps_per_epoch, clip=2.0):
    sched = warmup_exponential_schedule(base_lr, steps_per_epoch, 10, 1e-6,
                                        0.98)
    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(clip), optax.adam(sched)),
        max_consecutive_errors=int(1e8))


@pytest.mark.parametrize("flat", [True, False])
def test_matches_legacy_apply_if_finite_chain(flat):
    params = _tree(0)
    opt = make_optimizer(5e-5, steps_per_epoch=2, flat=flat)
    legacy = _legacy_optimizer(5e-5, steps_per_epoch=2)
    s_new, s_old = opt.init(params), legacy.init(params)
    p_new, p_old = params, params
    for step in range(5):
        grads = jax.tree.map(
            lambda x: jnp.asarray(np.random.RandomState(step).normal(
                size=x.shape).astype(np.float32) * (10.0 if step == 2 else 1.0)),
            params)  # step 2 exercises the global-norm clip
        u_new, s_new = opt.update(grads, s_new, p_new)
        u_old, s_old = legacy.update(grads, s_old, p_old)
        p_new = optax.apply_updates(p_new, u_new)
        p_old = optax.apply_updates(p_old, u_old)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_old)):
        # flatten changes the clip-norm summation order only
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf, -jnp.inf])
@pytest.mark.parametrize("flat", [True, False])
def test_nonfinite_grads_skip_update(flat, bad):
    params = _tree(1)
    opt = make_optimizer(1e-3, steps_per_epoch=1, flat=flat)
    state = opt.init(params)

    good = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(good, state, params)
    params1 = optax.apply_updates(params, updates)
    state_leaves_after_1 = [np.asarray(x) for x in jax.tree.leaves(state)]

    grads = jax.tree.map(jnp.ones_like, params)
    grads["mlp"]["b"] = grads["mlp"]["b"].at[3].set(bad)
    updates, state2 = opt.update(grads, state, params1)
    # zero updates: params unchanged by the bad batch
    assert all(np.all(np.asarray(u) == 0) for u in jax.tree.leaves(updates))
    # inner state (mu/nu/step count) untouched; only the skip counter moves
    changed = [
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(state_leaves_after_1, jax.tree.leaves(state2))
    ]
    assert sum(changed) == 1  # exactly the notfinite counter
    # nothing nonfinite leaked
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state2))

    # a following finite step applies normally and resets the counter
    updates, state3 = opt.update(good, state2, params1)
    assert any(np.any(np.asarray(u) != 0) for u in jax.tree.leaves(updates))


def test_skip_counter_counts_consecutive():
    params = {"w": jnp.ones((4,))}
    opt = skip_nonfinite(optax.sgd(0.1))
    state = opt.init(params)
    bad = {"w": jnp.full((4,), jnp.nan)}
    good = {"w": jnp.ones((4,))}
    _, state = opt.update(bad, state, params)
    _, state = opt.update(bad, state, params)
    assert int(state.notfinite_count) == 2
    _, state = opt.update(good, state, params)
    assert int(state.notfinite_count) == 0


def test_flat_state_is_flat():
    """The DP optimizer state really is a handful of flat vectors (the
    point of the rework: one fused Adam / clip / isfinite op instead of
    hundreds of per-leaf ones)."""
    params = _tree(2)
    opt = make_optimizer(1e-4, steps_per_epoch=1, flat=True)
    state = opt.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    big = [x for x in jax.tree.leaves(state)
           if getattr(x, "size", 0) == n_params]
    assert len(big) == 2  # Adam mu and nu, each one concatenated vector
