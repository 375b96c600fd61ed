"""MaskedBatchNorm vs torch.nn.BatchNorm1d: batch normalization AND
running-statistic semantics must match.

torch normalizes the batch with the *biased* variance but stores the
Bessel-corrected (*unbiased*) variance in ``running_var``
(reference usage: ``scene_graph_encoder.py:35-48``).  Models trained
here therefore eval with the same normalization a torch-trained model
would.  The unbiased-storage fix is mutation-checked: the biased
update diverges from torch beyond the test tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from isubgvqa_tpu.models.layers import MaskedBatchNorm


def _run_pair(rng, steps=4, b=6, n=5, c=3, momentum=0.9):
    """Run N masked updates through both implementations; return
    (jax batch_stats, torch bn, per-step jax outs, per-step torch outs).
    """
    bn_j = MaskedBatchNorm(c, momentum=momentum)
    bn_t = torch.nn.BatchNorm1d(c, momentum=1.0 - momentum, eps=1e-5)
    bn_t.train()

    xs, masks = [], []
    for _ in range(steps):
        x = rng.normal(size=(b, n, c)).astype(np.float32) * 2.0 + 0.5
        m = rng.random((b, n)) > 0.3
        m[:, 0] = True                      # every row keeps >=1 node
        xs.append(x)
        masks.append(m)

    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                          mask=jnp.asarray(masks[0]),
                          use_running_average=False)
    stats = variables["batch_stats"]
    outs_j, outs_t = [], []
    for x, m in zip(xs, masks):
        out, mut = bn_j.apply(
            {"params": variables.get("params", {}), "batch_stats": stats},
            jnp.asarray(x), mask=jnp.asarray(m), use_running_average=False,
            mutable=["batch_stats"])
        stats = mut["batch_stats"]
        outs_j.append(np.asarray(out)[m])          # valid rows only
        # torch sees exactly the valid rows
        xt = torch.from_numpy(x[m])
        outs_t.append(bn_t(xt).detach().numpy())
    return stats, bn_t, outs_j, outs_t


def test_masked_batchnorm_matches_torch_batchnorm1d(rng):
    stats, bn_t, outs_j, outs_t = _run_pair(rng)
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(oj, ot, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               bn_t.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    # running_var must be the Bessel-corrected estimator, as torch
    # stores it (the biased variant differs by factor n/(n-1) per step)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               bn_t.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_running_var_is_unbiased_not_biased(rng):
    """Mutation check: with few valid rows per step the biased and
    unbiased running variances differ far beyond test tolerance, so a
    regression to the biased update cannot hide."""
    steps, b, n, c, momentum = 3, 2, 3, 2, 0.9
    rng2 = np.random.default_rng(1)
    xs = [rng2.normal(size=(b, n, c)).astype(np.float32) for _ in range(steps)]
    masks = []
    for _ in range(steps):
        m = rng2.random((b, n)) > 0.3
        m[:, 0] = True
        masks.append(m)

    bn_j = MaskedBatchNorm(c, momentum=momentum)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                          mask=jnp.asarray(masks[0]),
                          use_running_average=False)
    stats = variables["batch_stats"]
    biased = np.ones((c,), np.float32)        # the buggy trajectory
    for x, m in zip(xs, masks):
        _, mut = bn_j.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), mask=jnp.asarray(m), use_running_average=False,
            mutable=["batch_stats"])
        stats = mut["batch_stats"]
        rows = x[m]
        biased = momentum * biased + (1 - momentum) * rows.var(axis=0)

    bn_t = torch.nn.BatchNorm1d(c, momentum=1.0 - momentum)
    bn_t.train()
    for x, m in zip(xs, masks):
        bn_t(torch.from_numpy(x[m]))
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               bn_t.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)
    # the biased update would sit visibly below torch's stored stats
    assert np.max(np.abs(biased - bn_t.running_var.numpy())) > 1e-2


def test_eval_uses_running_stats(rng):
    stats, bn_t, _, _ = _run_pair(rng)
    bn_t.eval()
    x = rng.normal(size=(4, 3, 3)).astype(np.float32)
    m = np.ones((4, 3), bool)
    bn_j = MaskedBatchNorm(3)
    params = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       mask=jnp.asarray(m))["params"]
    out = bn_j.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), mask=jnp.asarray(m),
                     use_running_average=True)
    out_t = bn_t(torch.from_numpy(x.reshape(-1, 3))).detach().numpy()
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 3), out_t,
                               rtol=1e-4, atol=1e-5)
