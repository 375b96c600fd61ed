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


def _dense_incidences(src, dst, edge_mask, n):
    f32 = jnp.float32
    oh_src = jax.nn.one_hot(src, n, dtype=f32) * edge_mask[..., None]
    oh_dst = jax.nn.one_hot(dst, n, dtype=f32) * edge_mask[..., None]
    return oh_src, oh_dst


def test_dense_node_gate_to_edge_gate_dst_only_backward():
    """node_edge_masks.py:13-19: grad(mask) = scatter_sum(g, dst) — the
    raw cotangent, with no product-rule gate weighting and no leak
    through invalid edges."""
    from isubgvqa_tpu.sampling.node_edge import dense_node_gate_to_edge_gate

    rng = np.random.default_rng(0)
    b, n, e = 2, 5, 8
    gate = jnp.asarray(rng.uniform(0.2, 1.5, (b, n, 1)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    edge_mask = jnp.asarray(rng.uniform(size=(b, e)) > 0.25)
    oh_src, oh_dst = _dense_incidences(src, dst, edge_mask, n)
    w = jnp.asarray(rng.normal(size=(b, e, 1)).astype(np.float32))

    egate = dense_node_gate_to_edge_gate(gate, oh_src, oh_dst)
    exp_fwd = (np.einsum("ben,bnk->bek", oh_src, gate)
               * np.einsum("ben,bnk->bek", oh_dst, gate))
    np.testing.assert_allclose(np.asarray(egate), exp_fwd, atol=1e-6)

    grad = jax.grad(
        lambda g: jnp.sum(w * dense_node_gate_to_edge_gate(g, oh_src, oh_dst))
    )(gate)
    expected = np.einsum("ben,bek->bnk", np.asarray(oh_dst), np.asarray(w))
    np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-6)

    # with non-unit gates, the product rule would differ — make sure we
    # are actually testing the quirk, not a coincidence
    product_rule = (np.einsum("ben,bek->bnk", np.asarray(oh_dst),
                              np.asarray(w) * np.einsum(
                                  "ben,bnk->bek", oh_src, gate))
                    + np.einsum("ben,bek->bnk", np.asarray(oh_src),
                                np.asarray(w) * np.einsum(
                                    "ben,bnk->bek", oh_dst, gate)))
    assert not np.allclose(np.asarray(grad), product_rule)


def _tiny_gat_inputs(seed=0, b=2, n=6, e=10, c=8, heads=2):
    rng = np.random.default_rng(seed)
    hc = heads * c
    p_dim = hc // 2
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    params = {
        "wl": f(c, hc), "bl": f(hc), "wr": f(c, hc), "br": f(hc),
        "attb": f(hc, heads), "expand": f(heads, hc), "cbias": f(hc),
        "w1": f(hc, p_dim), "b1": f(p_dim), "w2": f(p_dim, c), "b2": f(c),
        "gn_w": f(c), "gn_b": f(c), "gn_a": f(c),
    }
    h = f(b, n, c)
    xf = f(b, n, c)
    instr = f(b, c)
    gate = jnp.asarray(rng.uniform(0.2, 1.5, (b, n, 1)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    edge_mask = jnp.asarray(rng.uniform(size=(b, e)) > 0.2)
    node_mask = jnp.ones((b, n), bool)
    eproj = f(b, e, hc)
    return (h, xf, instr, gate, src, dst, edge_mask, node_mask, eproj,
            params)


def test_gat_layer_mask_gradient_is_dst_only():
    """Model-level check (mgat_v2_conv.py:159-171): the gradient of the
    layer output w.r.t. the node gate equals the dst-only scatter of
    the cotangent arriving at the edge gate — i.e. the live training
    path routes through the custom VJP, not the product rule."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import gat_layer_reference
    from isubgvqa_tpu.sampling.node_edge import dense_node_gate_to_edge_gate

    (h, xf, instr, gate, src, dst, edge_mask, node_mask, eproj,
     params) = _tiny_gat_inputs()
    n = h.shape[1]
    oh_src, oh_dst = _dense_incidences(src, dst, edge_mask, n)

    def loss_from_gate(g):
        out, alpha = gat_layer_reference(
            h, xf, instr, g, src, dst, edge_mask, node_mask, eproj, params)
        return jnp.sum(out * out) + jnp.sum(alpha)

    def loss_from_egate(eg):
        out, alpha = gat_layer_reference(
            h, xf, instr, gate, src, dst, edge_mask, node_mask, eproj,
            params, egate=eg)
        return jnp.sum(out * out) + jnp.sum(alpha)

    egate0 = dense_node_gate_to_edge_gate(gate, oh_src, oh_dst)
    ct_egate = jax.grad(loss_from_egate)(egate0)
    expected = jnp.einsum("ben,bek->bnk", oh_dst, ct_egate)

    actual = jax.grad(loss_from_gate)(gate)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(actual).sum()) > 0.0


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
