"""Differentiable fused MetaLayer (training path): forward and
gradient exactness vs the op-by-op XLA reference, interpret mode.

Mirrors ``tests/test_gat_train.py`` for the scene-graph encoder's
message round (``ops/pallas/metalayer_train.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.ops.pallas.metalayer_kernel import metalayer_reference
from isubgvqa_tpu.ops.pallas.metalayer_train import fused_metalayer_train
from tests.test_metalayer_kernel import make_inputs


def test_metalayer_train_forward_matches_reference(rng):
    args = make_inputs(rng)
    xk, ek = fused_metalayer_train(*args, True)
    xr, er = metalayer_reference(*args)
    np.testing.assert_allclose(np.asarray(ek), np.asarray(er),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                               rtol=2e-4, atol=2e-4)


def test_metalayer_train_grads_match_reference(rng):
    """Every differentiable leaf: x, e_attr and all 15 params —
    including gradient flowing into e_out from BOTH its direct
    cotangent and its reuse inside the node MLP."""
    x, eattr, src, dst, em, nm, params = make_inputs(rng)
    b, n, c = x.shape
    e = eattr.shape[1]
    wx = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(b, e, c)).astype(np.float32))

    def loss_fused(x_, e_, p_):
        xo, eo = fused_metalayer_train(x_, e_, src, dst, em, nm, p_, True)
        return jnp.sum(xo * wx) + jnp.sum(eo * we)

    def loss_ref(x_, e_, p_):
        xo, eo = metalayer_reference(x_, e_, src, dst, em, nm, p_)
        return jnp.sum(xo * wx) + jnp.sum(eo * we)

    lf = loss_fused(x, eattr, params)
    lr = loss_ref(x, eattr, params)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-4)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, eattr, params)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, eattr, params)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=5e-4, atol=5e-4, err_msg="d_x")
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=5e-4, atol=5e-4, err_msg="d_e_attr")
    for k in gr[2]:
        np.testing.assert_allclose(
            np.asarray(gf[2][k]), np.asarray(gr[2][k]),
            rtol=5e-4, atol=5e-4, err_msg=f"params[{k}]")


def test_encoder_train_path_uses_fused_metalayer(monkeypatch, rng):
    """Model-level wiring: SceneGraphEncoder in training mode with the
    fused path forced on produces the same value and gradients as the
    XLA reference path, and the fused function provably ran."""
    from isubgvqa_tpu.models import scene_graph_encoder as sge_mod
    from isubgvqa_tpu.ops.pallas import gat_train
    from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                                   HashWordTokenizer, SceneGraphVocab,
                                   SyntheticGQA)
    from isubgvqa_tpu.models.scene_graph_encoder import SceneGraphEncoder

    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(8)
    ds = SyntheticGQA(vocab, answers, size=4, seed=0)
    spec = BucketSpec(batch_size=2, max_nodes_per_graph=16,
                      max_edges_per_graph=64, question_len=8)
    tok = HashWordTokenizer(vocab_size=64, max_len=8)
    batch, _ = Collator(tok, spec, vocab=vocab).collate([ds[0], ds[1]])

    enc = SceneGraphEncoder(sg_vocab_size=len(vocab), hidden_dim=300)
    variables = enc.init(jax.random.PRNGKey(0), batch, deterministic=True)

    def loss(p):
        (xo, eo), _ = enc.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, deterministic=False, mutable=["batch_stats"])
        return jnp.sum(xo ** 2) + jnp.sum(eo ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(variables["params"])

    calls = {"n": 0}
    orig = sge_mod.fused_metalayer_train

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(gat_train, "FORCE_INTERPRET", True)
    monkeypatch.setattr(sge_mod, "fused_metalayer_train", spy)
    l_fused, g_fused = jax.value_and_grad(loss)(variables["params"])

    assert calls["n"] == 1
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-4)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, gr), (_, gf) in zip(flat_r, flat_f):
        scale = float(np.max(np.abs(np.asarray(gr))))
        # atol floor: leaves with near-total cancellation (gn_bias sums
        # zero-mean normed rows) carry only fp32 roundoff on both sides
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3,
            atol=max(5e-4 * scale, 2e-5),
            err_msg=jax.tree_util.keystr(path))
