"""Property and gradient tests for the discrete top-k samplers."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.sampling import (
    topk_mask,
    gumbel_topk_sample,
    GumbelSamplerConfig,
    imle_topk,
    IMLEConfig,
    aimle_topk,
    AIMLEConfig,
    init_aimle_state,
    simple_sample,
    exact_k_marginals,
    SimpleConfig,
    node_mask_to_edge_mask,
)


# ---------------------------------------------------------------- gumbel

def test_gumbel_train_exactly_k():
    cfg = GumbelSamplerConfig(k=3)
    scores = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    out = gumbel_topk_sample(scores, jax.random.PRNGKey(1), cfg, train=True)
    assert out.shape == (1, 4, 10)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 3.0)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_gumbel_eval_is_noisy_forward():
    """Parity pin (masking.py:175 + gumbel_scheme.py:26,63): eval calls
    the sampler *forward*, which still adds Gumbel noise — ``train``
    only selects the ensemble size.  The eval mask must therefore
    match the train-path computation with the same key, and must not
    always equal the deterministic top-k."""
    cfg = GumbelSamplerConfig(k=2)
    scores = jnp.array([[0.0, 5.0, 1.0, 4.0]])
    key = jax.random.PRNGKey(1)
    out_eval = gumbel_topk_sample(scores, key, cfg, train=False)
    out_train = gumbel_topk_sample(scores, key, cfg, train=True)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_train))
    np.testing.assert_allclose(np.asarray(out_eval.sum(-1)), 2.0)

    # over many keys, noise must flip the selection at least once
    det = np.array([0, 1, 0, 1], np.float32)
    flipped = any(
        not np.allclose(
            np.asarray(gumbel_topk_sample(scores, jax.random.PRNGKey(s),
                                          cfg, train=False)[0, 0]), det)
        for s in range(64))
    assert flipped


def test_gumbel_validation_deterministic_topk():
    """gumbel_scheme.py:109-123 — capability parity for the (unused
    from the masking path) ``validation()`` method."""
    from isubgvqa_tpu.sampling import gumbel_validation

    cfg = GumbelSamplerConfig(k=2)
    scores = jnp.array([[0.0, 5.0, 1.0, 4.0]])
    out = gumbel_validation(scores, None, cfg)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 1, 0, 1])


def test_gumbel_gradient_flows():
    cfg = GumbelSamplerConfig(k=2)

    def loss(s):
        m = gumbel_topk_sample(s, jax.random.PRNGKey(0), cfg, train=True)
        return jnp.sum(m[0] * s)

    g = jax.grad(loss)(jnp.ones((2, 6)))
    assert np.any(np.asarray(g) != 0.0)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------------ imle

def test_imle_eval_deterministic():
    cfg = IMLEConfig(k=2, nb_samples=1).for_eval()
    assert cfg.input_noise_temperature == 0.0
    scores = jnp.array([[3.0, -1.0, 2.0, 0.0]])
    z = imle_topk(scores, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(z[0, 0]), [1, 0, 1, 0])


def test_imle_gradient_direction_toy():
    """I-MLE gradients should let us learn scores that select a target
    subset (the classic perturb-and-MAP sanity check)."""
    cfg = IMLEConfig(k=2, nb_samples=10, input_noise_temperature=1.0,
                     target_noise_temperature=1.0, beta=10.0)
    target = jnp.array([[1.0, 1.0, 0.0, 0.0, 0.0]])
    theta = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0]])

    def loss_fn(th, key):
        z = imle_topk(th, key, cfg)          # [S, B, N]
        return jnp.mean(jnp.sum((z - target[None]) ** 2, axis=-1))

    grad_fn = jax.jit(jax.grad(loss_fn))
    key = jax.random.PRNGKey(42)
    for i in range(60):
        key, sub = jax.random.split(key)
        theta = theta - 0.1 * grad_fn(theta, sub)
    final = topk_mask(theta, 2)
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(target[0]))


def test_imle_jits():
    cfg = IMLEConfig(k=2)
    f = jax.jit(lambda t, k: imle_topk(t, k, cfg))
    z = f(jnp.zeros((3, 8)), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(z.sum(-1)), 2.0)


# ----------------------------------------------------------------- aimle

def test_aimle_forward_exactly_k():
    cfg = AIMLEConfig(k=3)
    state = init_aimle_state()
    z = aimle_topk(jnp.zeros((2, 7)), state, jax.random.PRNGKey(0), cfg)
    assert z.shape == (1, 2, 7)
    np.testing.assert_allclose(np.asarray(z.sum(-1)), 3.0)


def test_aimle_state_smuggling():
    """The cotangent of the state input must be the updated state."""
    cfg = AIMLEConfig(k=2, beta_update_step=1e-4, nb_samples=8)
    state = init_aimle_state(initial_beta=5.0)
    theta = jnp.array([[1.0, 0.5, -0.2, 0.1]])
    target = jnp.array([[0.0, 0.0, 1.0, 1.0]])

    def loss_fn(th, st):
        z = aimle_topk(th, st, jax.random.PRNGKey(3), cfg)
        return jnp.mean(jnp.sum((z - target[None]) ** 2, axis=-1))

    g_theta, g_state = jax.grad(loss_fn, argnums=(0, 1))(theta, state)
    # smuggled state: beta moved by ±step from 5.0, grad_norm updated EMA
    assert abs(float(g_state.beta) - 5.0) <= 1e-4 + 1e-5
    assert float(g_state.grad_norm) != 1.0
    assert np.all(np.isfinite(np.asarray(g_theta)))
    assert np.any(np.asarray(g_theta) != 0.0)


def test_aimle_grad_descent_learns_target():
    cfg = AIMLEConfig(k=2, nb_samples=10)
    state = init_aimle_state(initial_beta=3.0)
    target = jnp.array([[0.0, 1.0, 0.0, 1.0, 0.0]])
    # λ = β·‖θ‖/‖∇y‖ vanishes at θ = 0 exactly, so start off-origin
    # (the reference's gate scores are never exactly zero either).
    theta = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (1, 5))
    key = jax.random.PRNGKey(0)

    def loss_fn(th, st, k):
        z = aimle_topk(th, st, k, cfg)
        return jnp.mean(jnp.sum((z - target[None]) ** 2, axis=-1))

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    for _ in range(80):
        key, sub = jax.random.split(key)
        g_theta, new_state = grad_fn(theta, state, sub)
        theta = theta - 0.1 * g_theta
        state = new_state
    final = topk_mask(theta, 2)
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(target[0]))


# ---------------------------------------------------------------- simple

def brute_force_marginals(theta, k):
    """Enumerate subsets with the reference's literal weights."""
    n = len(theta)
    w1 = np.exp(theta)
    w0 = 1.0 - np.exp(-np.abs(theta))
    tot = 0.0
    per_item = np.zeros(n)
    for subset in itertools.combinations(range(n), k):
        w = 1.0
        for i in range(n):
            w *= w1[i] if i in subset else w0[i]
        tot += w
        for i in subset:
            per_item[i] += w
    return per_item / tot


@pytest.mark.parametrize("n,k", [(5, 2), (6, 3), (7, 1), (4, 4)])
def test_simple_marginals_match_brute_force(n, k, rng):
    theta = rng.normal(size=n).astype(np.float32)
    m = exact_k_marginals(jnp.array(theta)[None], k)[0]
    ref = brute_force_marginals(theta.astype(np.float64), k)
    np.testing.assert_allclose(np.asarray(m), ref, rtol=1e-4, atol=1e-5)


def test_simple_marginals_sum_to_k(rng):
    theta = jnp.array(rng.normal(size=(3, 12)).astype(np.float32))
    m = exact_k_marginals(theta, 4)
    np.testing.assert_allclose(np.asarray(m.sum(-1)), 4.0, rtol=1e-4)


def test_simple_sample_exactly_k_and_ste():
    cfg = SimpleConfig(k=3)
    scores = jax.random.normal(jax.random.PRNGKey(0), (4, 9))
    masks, marg = simple_sample(scores, jax.random.PRNGKey(1), cfg, train=True)
    np.testing.assert_allclose(np.asarray(masks.sum(-1)), 3.0, rtol=1e-5)

    # STE: d(masks)/d(scores) equals d(marginals)/d(scores)
    def f_mask(s):
        m, _ = simple_sample(s, jax.random.PRNGKey(1), cfg, train=True)
        return jnp.sum(m)

    def f_marg(s):
        return jnp.sum(exact_k_marginals(s, 3))

    g1 = jax.grad(f_mask)(scores)
    g2 = jax.grad(f_marg)(scores)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_simple_padding_never_selected_in_marginals(rng):
    theta = np.concatenate(
        [rng.normal(size=5), np.full(3, -1.0e10)]
    ).astype(np.float32)
    m = np.asarray(exact_k_marginals(jnp.array(theta)[None], 2)[0])
    np.testing.assert_allclose(m[5:], 0.0, atol=1e-12)
    np.testing.assert_allclose(m.sum(), 2.0, rtol=1e-4)


# ------------------------------------------------------------- node-edge

def test_node_edge_mask_forward_backward():
    mask = jnp.array([[1.0], [0.5], [0.0]])
    src = jnp.array([0, 1, 2, 1])
    dst = jnp.array([1, 0, 1, 2])

    em = node_mask_to_edge_mask(mask, src, dst, 3)
    np.testing.assert_allclose(np.asarray(em)[:, 0], [0.5, 0.5, 0.0, 0.0])

    def loss(m):
        return jnp.sum(node_mask_to_edge_mask(m, src, dst, 3) * jnp.arange(1.0, 5.0)[:, None])

    g = jax.grad(loss)(mask)
    # reference backward: grad scattered to dst only (node_edge_masks.py:13-19)
    np.testing.assert_allclose(np.asarray(g)[:, 0], [2.0, 1.0 + 3.0, 4.0])


def test_simple_validation_deterministic():
    from isubgvqa_tpu.sampling.simple import simple_validation

    cfg = SimpleConfig(k=2)
    scores = jnp.array([[0.5, 3.0, -1.0, 2.0]])
    mask, marg = simple_validation(scores, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(mask[0, 0]), [0, 1, 0, 1])
    np.testing.assert_allclose(np.asarray(marg).sum(), 2.0, rtol=1e-4)


def test_gumbel_train_ensemble():
    cfg = GumbelSamplerConfig(k=2, train_ensemble=3)
    out = gumbel_topk_sample(jnp.zeros((2, 6)), jax.random.PRNGKey(0), cfg,
                             train=True)
    assert out.shape == (3, 2, 6)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 2.0)


def test_imle_nb_samples_axis():
    cfg = IMLEConfig(k=2, nb_samples=5)
    z = imle_topk(jnp.zeros((3, 7)), jax.random.PRNGKey(0), cfg)
    assert z.shape == (5, 3, 7)
    np.testing.assert_allclose(np.asarray(z.sum(-1)), 2.0)


def test_gumbel_tpu_mode_saturation_grads_finite(monkeypatch):
    """The TPU-mode relaxed top-k (sampling/gumbel.py:_bounded_log)
    must keep gradients finite under saturation — the failure that
    froze round-5's on-TPU gumbel training: at tau=0.1 a score gap
    >~1.7 rounds a round's softmax to exactly 1.0, log(1-onehot)'s
    backward goes inf, and the reference's GradScaler-equivalent skip
    then freezes every step.  Forward values must stay identical to
    the CPU/reference path (the backward cutoff is backward-only)."""
    from isubgvqa_tpu.sampling import gumbel as gmod

    scores = jnp.asarray([[50.0, 30.0, 10.0, -10.0, -30.0, 0.0]])
    key = jax.random.PRNGKey(3)

    def loss(s, tpu, cfg):
        monkeypatch.setattr(gmod, "_on_tpu", lambda: tpu)
        out = gumbel_topk_sample(s, key, cfg, train=True)
        return jnp.sum(out * jnp.arange(s.shape[-1], dtype=s.dtype))

    # CPU/reference path: saturated gaps produce nonfinite/garbage
    # gradients (this is the reference's own behavior — its scaler
    # skips such steps); TPU path must be finite and agree on forward
    cfg = GumbelSamplerConfig(k=3)            # tau=0.1: saturates
    v_cpu = loss(scores, False, cfg)
    v_tpu, g_tpu = jax.value_and_grad(
        lambda s: loss(s, True, cfg))(scores)
    np.testing.assert_allclose(np.asarray(v_cpu), np.asarray(v_tpu),
                               rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(g_tpu)))
    # the whole relaxation's VJP is clamped elementwise on TPU, so the
    # k compounded 1/(1-o) factors can never overflow downstream
    # (sampling/gumbel.py:_GRAD_LIMIT; dy here is O(N), so the clamp
    # bound scales with it)
    assert np.max(np.abs(np.asarray(g_tpu))) <= gmod._GRAD_LIMIT * 10

    # benign regime (tau high enough that no round saturates past the
    # backward floor): gradients bit-identical between the two modes
    mild_cfg = GumbelSamplerConfig(k=3, tau=5.0)
    mild = jax.random.normal(jax.random.PRNGKey(1), (2, 8)) * 0.05
    g_ref = jax.grad(lambda s: loss(s, False, mild_cfg))(mild)
    g_new = jax.grad(lambda s: loss(s, True, mild_cfg))(mild)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)
