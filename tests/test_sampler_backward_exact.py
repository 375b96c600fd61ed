"""Exact backward-formula checks for IMLE/AIMLE with the noise zeroed:
the custom VJPs must reproduce the reference's closed-form gradients
(wrapper.py:123-172, aimle.py:140-243, target_aimle.py:111-161)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.sampling import (AIMLEConfig, IMLEConfig, aimle_topk,
                                   imle_topk, init_aimle_state, topk_mask)


def test_imle_backward_formula_zero_noise():
    cfg = IMLEConfig(k=2, nb_samples=1, noise_scale=0.0,
                     input_noise_temperature=1.0,
                     target_noise_temperature=1.0, alpha=1.0, beta=10.0)
    theta = jnp.array([[3.0, 1.0, 2.0, 0.5]])
    dy = jnp.array([[[0.7, -0.3, 0.1, 0.2]]])     # [S=1, B, N]

    _, vjp = jax.vjp(lambda t: imle_topk(t, jax.random.PRNGKey(0), cfg), theta)
    grad = vjp(dy)[0]

    z = np.asarray(topk_mask(theta, 2))
    target = np.asarray(topk_mask(1.0 * theta - 10.0 * dy[0], 2))
    expected = z - target                          # wrapper.py:170-172
    np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-6)


def test_aimle_backward_formula_zero_noise():
    cfg = AIMLEConfig(k=2, nb_samples=1, noise_scale=0.0,
                      theta_noise_temperature=1.0,
                      target_noise_temperature=1.0, alpha=1.0,
                      symmetric_perturbation=True,
                      grad_norm_decay_rate=0.9, beta_update_step=1e-4)
    state = init_aimle_state(initial_beta=2.0)
    theta = jnp.array([[3.0, 1.0, 2.0, 0.5]])
    dy = jnp.array([[[0.7, -0.3, 0.1, 0.2]]])

    _, vjp = jax.vjp(
        lambda t, s: aimle_topk(t, s, jax.random.PRNGKey(0), cfg),
        theta, state)
    grad, new_state = vjp(dy)

    # λ = β‖θ‖/‖dy‖ (target_aimle.py:111-115)
    lam = 2.0 * np.linalg.norm(np.asarray(theta)) / np.linalg.norm(np.asarray(dy))
    z_l = np.asarray(topk_mask(theta + lam * dy[0], 2))
    z_r = np.asarray(topk_mask(theta - lam * dy[0], 2))
    g3 = (z_l - z_r) / 2.0                         # aimle.py:229-235
    expected = g3 / lam                            # target_aimle.py:161
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-5)

    # state update (target_aimle.py:130-161)
    nnz = float((g3 != 0).sum())
    exp_norm = 0.9 * 1.0 + 0.1 * nnz               # B*S = 1
    np.testing.assert_allclose(float(new_state.grad_norm), exp_norm, rtol=1e-5)
    step = 1e-4 if exp_norm < 1.0 else -1e-4
    np.testing.assert_allclose(float(new_state.beta), 2.0 + step, rtol=1e-5)
    np.testing.assert_allclose(float(new_state.prev_update), step, rtol=1e-5)


def test_checkpoint_every_50_policy(tmp_path):
    """train_loop.py:115-130: epoch-50 multiples snapshot separately."""
    import jax

    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.train.checkpoint import CheckpointManager
    from isubgvqa_tpu.train.state import TrainState

    state = TrainState(step=jnp.asarray(0), params={"w": jnp.zeros(2)},
                       opt_state=(), batch_stats={}, aimle_states=None)
    cfg = Config()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_policy(state, epoch=49, cfg=cfg, val_loss=1.0, val_acc=0.5,
                    best_loss=2.0, best_acc=0.0)
    names = set(p.name for p in tmp_path.iterdir())
    assert "checkpoint" in names
    assert "checkpoint0049" in names           # (49+1) % 50 == 0
    assert "checkpoint_lowest_val_loss" in names
    assert "checkpoint_top_res" in names
