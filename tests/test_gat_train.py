"""Differentiable fused GAT conv (training path): forward AND gradient
exactness vs the op-by-op XLA reference, in interpret mode on CPU.

The custom-VJP Pallas pair (``ops/pallas/gat_train.py``) must produce
bit-comparable f32 gradients to ``jax.grad`` through
``gat_conv_reference`` / ``gat_layer_reference`` for every
differentiable input — including the reference's dst-only node-gate
backward quirk (``sampling/node_edge_masks.py:13-19``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.ops.pallas.gat_kernel import (
    gat_conv_reference,
    gat_layer_reference,
)
from isubgvqa_tpu.ops.pallas.gat_train import (
    fused_gat_layer_train,
    fused_gatconv,
)
from tests.test_gat_kernel import make_inputs


def _split_args(fa):
    """make_inputs fused dict -> (diff inputs, static inputs)."""
    static = dict(src=fa["src"], dst=fa["dst"], edge_mask=fa["edge_mask"])
    diff = dict(xf=fa["xf"], gate=fa["gate"], e_attr=fa["e_attr"],
                params=fa["params"])
    return diff, static


def _fused_conv_loss(static, wc, wa):
    def loss(xf, gate, e_attr, params):
        conv, alpha = fused_gatconv(xf, gate, static["src"], static["dst"],
                                    static["edge_mask"], e_attr, params,
                                    0.2, True)
        return jnp.sum(conv * wc) + jnp.sum(alpha * wa)
    return loss


def _ref_conv_loss(static, wc, wa):
    def loss(xf, gate, e_attr, params):
        eproj = jnp.einsum("bec,ch->beh", e_attr.astype(jnp.float32),
                           params["we"].astype(jnp.float32))
        conv, alpha = gat_conv_reference(xf, gate, static["src"],
                                         static["dst"], static["edge_mask"],
                                         eproj, params)
        return jnp.sum(conv * wc) + jnp.sum(alpha * wa)
    return loss


def test_fused_gatconv_forward_matches_reference(rng):
    fa, ra = make_inputs(rng)
    diff, static = _split_args(fa)
    conv_k, alpha_k = fused_gatconv(diff["xf"], diff["gate"], static["src"],
                                    static["dst"], static["edge_mask"],
                                    diff["e_attr"], diff["params"],
                                    0.2, True)
    conv_r, alpha_r = gat_conv_reference(
        ra["xf"], ra["gate"], ra["src"], ra["dst"], ra["edge_mask"],
        ra["eproj"], ra["params"])
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(conv_k), np.asarray(conv_r),
                               rtol=2e-4, atol=2e-4)


def test_fused_gatconv_grads_match_reference(rng):
    """Every differentiable leaf: xf, gate, e_attr, and all 8 conv
    params (incl. attb off-block entries and expand)."""
    fa, _ = make_inputs(rng)
    diff, static = _split_args(fa)
    b, e, _ = fa["e_attr"].shape
    n = fa["xf"].shape[1]
    hc = diff["params"]["wl"].shape[1]
    h = diff["params"]["attb"].shape[1]
    wc = jnp.asarray(rng.normal(size=(b, n, hc)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(b, e, h)).astype(np.float32))

    g_fused = jax.grad(_fused_conv_loss(static, wc, wa), argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    g_ref = jax.grad(_ref_conv_loss(static, wc, wa), argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])

    names = ["xf", "gate", "e_attr"]
    for name, gk, gr in zip(names, g_fused[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
    for key in g_ref[3]:
        np.testing.assert_allclose(
            np.asarray(g_fused[3][key]), np.asarray(g_ref[3][key]),
            rtol=5e-4, atol=5e-4, err_msg=f"params[{key}]")


def test_gate_backward_is_dst_only(rng):
    """The node-gate gradient follows the reference's quirk: cotangent
    scatter-summed to destination nodes only — NOT the product rule.
    Mutation check: the product-rule gradient differs measurably."""
    fa, _ = make_inputs(rng)
    diff, static = _split_args(fa)
    b, n, _ = fa["xf"].shape
    e = fa["e_attr"].shape[1]
    hc = diff["params"]["wl"].shape[1]
    h = diff["params"]["attb"].shape[1]
    wc = jnp.asarray(rng.normal(size=(b, n, hc)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(b, e, h)).astype(np.float32))

    d_gate_fused = jax.grad(_fused_conv_loss(static, wc, wa), argnums=1)(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    d_gate_ref = jax.grad(_ref_conv_loss(static, wc, wa), argnums=1)(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    np.testing.assert_allclose(np.asarray(d_gate_fused),
                               np.asarray(d_gate_ref),
                               rtol=5e-4, atol=5e-4)

    # product-rule variant of the reference (plain multiply instead of
    # the custom-VJP gate) must disagree — proves the quirk is live
    def loss_product_rule(gate):
        f32 = jnp.float32
        oh_src = jax.nn.one_hot(static["src"], n, dtype=f32) \
            * static["edge_mask"][..., None]
        oh_dst = jax.nn.one_hot(static["dst"], n, dtype=f32) \
            * static["edge_mask"][..., None]
        egate = (jnp.einsum("ben,bnk->bek", oh_src, gate.astype(f32))
                 * jnp.einsum("ben,bnk->bek", oh_dst, gate.astype(f32)))
        eproj = jnp.einsum("bec,ch->beh",
                           diff["e_attr"].astype(f32),
                           diff["params"]["we"].astype(f32))
        conv, alpha = gat_conv_reference(
            diff["xf"], gate, static["src"], static["dst"],
            static["edge_mask"], eproj, diff["params"], egate=egate)
        return jnp.sum(conv * wc) + jnp.sum(alpha * wa)

    d_gate_product = jax.grad(loss_product_rule)(diff["gate"])
    assert not np.allclose(np.asarray(d_gate_fused),
                           np.asarray(d_gate_product), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("apply_mask", [False, True])
def test_fused_layer_train_matches_reference(rng, apply_mask):
    """Full trainable layer (Pallas conv + XLA head): outputs and
    gradients for h, xf, instr, gate, e_attr and all params leaves."""
    fa, _ = make_inputs(rng)
    static = dict(src=fa["src"], dst=fa["dst"], edge_mask=fa["edge_mask"],
                  node_mask=fa["node_mask"])
    b, n, c = fa["h"].shape
    wout = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    def loss_fused(h, xf, instr, gate, e_attr, params):
        out, alpha = fused_gat_layer_train(
            h, xf, instr, gate, static["src"], static["dst"],
            static["edge_mask"], static["node_mask"], e_attr, params,
            apply_mask_to_h=apply_mask, interpret=True)
        return jnp.sum(out * wout) + jnp.sum(alpha)

    def loss_ref(h, xf, instr, gate, e_attr, params):
        eproj = jnp.einsum("bec,ch->beh", e_attr.astype(jnp.float32),
                           params["we"].astype(jnp.float32))
        out, alpha = gat_layer_reference(
            h, xf, instr, gate, static["src"], static["dst"],
            static["edge_mask"], static["node_mask"], eproj, params,
            apply_mask_to_h=apply_mask)
        return jnp.sum(out * wout) + jnp.sum(alpha)

    args = (fa["h"], fa["xf"], fa["instr"], fa["gate"], fa["e_attr"],
            fa["params"])
    out_f = loss_fused(*args)
    out_r = loss_ref(*args)
    np.testing.assert_allclose(float(out_f), float(out_r), rtol=2e-4)

    g_f = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["h", "xf", "instr", "gate", "e_attr"]
    for name, gk, gr in zip(names, g_f[:5], g_r[:5]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3, err_msg=name)
    for key in g_r[5]:
        np.testing.assert_allclose(
            np.asarray(g_f[5][key]), np.asarray(g_r[5][key]),
            rtol=1e-3, atol=1e-3, err_msg=f"params[{key}]")


def test_fused_gatconv_bf16_smoke(rng):
    """bf16 ship path runs and stays near the f32 result."""
    fa, _ = make_inputs(rng)
    diff, static = _split_args(fa)
    xf16 = diff["xf"].astype(jnp.bfloat16)
    gate16 = diff["gate"].astype(jnp.bfloat16)
    e16 = diff["e_attr"].astype(jnp.bfloat16)
    conv16, alpha16 = fused_gatconv(xf16, gate16, static["src"],
                                    static["dst"], static["edge_mask"],
                                    e16, diff["params"], 0.2, True)
    conv32, alpha32 = fused_gatconv(diff["xf"], diff["gate"], static["src"],
                                    static["dst"], static["edge_mask"],
                                    diff["e_attr"], diff["params"],
                                    0.2, True)
    np.testing.assert_allclose(np.asarray(conv16), np.asarray(conv32),
                               rtol=0.1, atol=0.25)

    def loss16(xf, gate, e_attr, params):
        conv, alpha = fused_gatconv(xf, gate, static["src"], static["dst"],
                                    static["edge_mask"], e_attr, params,
                                    0.2, True)
        return jnp.sum(conv.astype(jnp.float32))

    grads = jax.grad(loss16, argnums=(0, 1, 2))(xf16, gate16, e16,
                                                diff["params"])
    assert grads[0].dtype == jnp.bfloat16
    assert all(bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
               for g in grads)


def test_model_train_grads_match_reference_path(monkeypatch, rng):
    """Model-level wiring: with the trainable fused path forced on
    (interpret kernels on CPU), the full model's training loss and
    parameter gradients match the XLA reference path — and the fused
    path provably ran (call spy)."""
    from isubgvqa_tpu.ops.pallas import gat_train
    from isubgvqa_tpu.models.build import build_model, init_model
    from isubgvqa_tpu.train.steps import cross_entropy_loss
    from tests.test_model import small_cfg, SceneGraphVocab, AnswerMap, \
        SyntheticGQA, BucketSpec, Collator, HashWordTokenizer

    cfg = small_cfg()
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=2,
                      max_nodes_per_graph=cfg.max_nodes_per_graph,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    batch, _ = Collator(tok, spec, vocab=vocab).collate([ds[0], ds[1]])

    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)
    rngs = {"dropout": jax.random.PRNGKey(1),
            "sampler": jax.random.PRNGKey(2)}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=True,
            rngs=rngs, mutable=["batch_stats"])
        return cross_entropy_loss(out.logits, batch.labels,
                                  batch.sample_mask)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)

    calls = {"n": 0}
    orig = gat_train.fused_gat_layer_train

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(gat_train, "FORCE_INTERPRET", True)
    monkeypatch.setattr(gat_train, "fused_gat_layer_train", spy)
    loss_fused, grads_fused = jax.value_and_grad(loss_fn)(params)

    assert calls["n"] == 4, "all four MGAT layers must take the fused path"
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(grads_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(grads_fused)
    for (path_r, gr), (_, gf) in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path_r))


def test_fused_gatconv_concat_width_grads(rng):
    """concat_instr-width xf ([B,N,2C]) with C-wide edges: the
    trainable conv's specs follow each width, gradients included."""
    fa, _ = make_inputs(rng)
    diff, static = _split_args(fa)
    b, n, c = fa["xf"].shape
    e = fa["e_attr"].shape[1]
    hc = diff["params"]["wl"].shape[1]
    h_ = diff["params"]["attb"].shape[1]
    ins_b = np.broadcast_to(np.asarray(fa["instr"])[:, None, :], (b, n, c))
    xf2 = jnp.asarray(np.concatenate([np.asarray(fa["xf"]), ins_b], -1))
    params = dict(diff["params"],
                  wl=jnp.asarray(rng.normal(size=(2 * c, hc)) * 0.2,
                                 dtype=jnp.float32),
                  wr=jnp.asarray(rng.normal(size=(2 * c, hc)) * 0.2,
                                 dtype=jnp.float32))
    wc = jnp.asarray(rng.normal(size=(b, n, hc)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(b, e, h_)).astype(np.float32))
    g_fused = jax.grad(_fused_conv_loss(static, wc, wa), argnums=(0, 2, 3))(
        xf2, diff["gate"], diff["e_attr"], params)
    g_ref = jax.grad(_ref_conv_loss(static, wc, wa), argnums=(0, 2, 3))(
        xf2, diff["gate"], diff["e_attr"], params)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]),
                               rtol=5e-4, atol=5e-4)
    for key in g_ref[2]:
        np.testing.assert_allclose(
            np.asarray(g_fused[2][key]), np.asarray(g_ref[2][key]),
            rtol=5e-4, atol=5e-4, err_msg=f"params[{key}]")


def test_fused_gatconv_packed_grads_match(rng):
    """pack=3 (block-diagonal multi-graph programs) must stay
    gradient-exact vs the reference — the packing wrapper is a pure
    layout transformation."""
    fa, _ = make_inputs(rng, b=5)
    diff, static = _split_args(fa)
    b, e, _ = fa["e_attr"].shape
    n = fa["xf"].shape[1]
    hc = diff["params"]["wl"].shape[1]
    h = diff["params"]["attb"].shape[1]
    wc = jnp.asarray(rng.normal(size=(b, n, hc)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(b, e, h)).astype(np.float32))

    def loss_packed(xf, gate, e_attr, params):
        conv, alpha = fused_gatconv(xf, gate, static["src"], static["dst"],
                                    static["edge_mask"], e_attr, params,
                                    0.2, True, 3)
        return jnp.sum(conv * wc) + jnp.sum(alpha * wa)

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    g_ref = jax.grad(_ref_conv_loss(static, wc, wa), argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    for gk, gr in zip(g_packed[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4)
    for key in g_ref[3]:
        np.testing.assert_allclose(
            np.asarray(g_packed[3][key]), np.asarray(g_ref[3][key]),
            rtol=5e-4, atol=5e-4, err_msg=f"params[{key}]")


def test_fused_gatconv_auto_pack_grads_match(rng):
    """pack="auto" (the config default) must stay gradient-exact vs
    the reference — the heuristic only changes program layout."""
    fa, _ = make_inputs(rng, b=5)
    diff, static = _split_args(fa)
    b, e, _ = fa["e_attr"].shape
    n = fa["xf"].shape[1]
    hc = diff["params"]["wl"].shape[1]
    h = diff["params"]["attb"].shape[1]
    wc = jnp.asarray(rng.normal(size=(b, n, hc)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(b, e, h)).astype(np.float32))

    def loss_auto(xf, gate, e_attr, params):
        conv, alpha = fused_gatconv(xf, gate, static["src"], static["dst"],
                                    static["edge_mask"], e_attr, params,
                                    0.2, True, "auto")
        return jnp.sum(conv * wc) + jnp.sum(alpha * wa)

    g_auto = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    g_ref = jax.grad(_ref_conv_loss(static, wc, wa), argnums=(0, 1, 2, 3))(
        diff["xf"], diff["gate"], diff["e_attr"], diff["params"])
    for gk, gr in zip(g_auto[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4)
    for key in g_ref[3]:
        np.testing.assert_allclose(
            np.asarray(g_auto[3][key]), np.asarray(g_ref[3][key]),
            rtol=5e-4, atol=5e-4, err_msg=f"params[{key}]")


def test_fused_gatconv_oversized_pack_clamps(rng):
    """An explicit int pack beyond the per-program caps (128 nodes /
    512 edges) is clamped, not lowered as-is — one config knob
    (cfg.kernel_pack) must be shape-safe for every bucket.  Forward
    must stay exact vs the reference under the clamp."""
    fa, ra = make_inputs(rng, b=5)
    diff, static = _split_args(fa)
    conv_k, alpha_k = fused_gatconv(diff["xf"], diff["gate"], static["src"],
                                    static["dst"], static["edge_mask"],
                                    diff["e_attr"], diff["params"],
                                    0.2, True, 999)
    conv_r, alpha_r = gat_conv_reference(
        ra["xf"], ra["gate"], ra["src"], ra["dst"], ra["edge_mask"],
        ra["eproj"], ra["params"])
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(conv_k), np.asarray(conv_r),
                               rtol=2e-4, atol=2e-4)


def test_kernel_pack_config_reaches_train_path(monkeypatch):
    """cfg.kernel_pack plumbing, training side: every MGAT layer passes
    the knob through fused_gat_layer_train (the same knob drives the
    inference kernel — see
    test_gat_kernel.py:test_kernel_pack_config_reaches_fused_layer).
    The layer itself is faked; packed gradient exactness is pinned by
    test_fused_gatconv_packed_grads_match."""
    from isubgvqa_tpu.ops.pallas import gat_train
    from isubgvqa_tpu.models.build import build_model, init_model
    from tests.test_model import (small_cfg, SceneGraphVocab, AnswerMap,
                                  SyntheticGQA, BucketSpec, Collator,
                                  HashWordTokenizer)

    cfg = small_cfg(kernel_pack=3)
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=4, seed=0)
    spec = BucketSpec(batch_size=2,
                      max_nodes_per_graph=cfg.max_nodes_per_graph,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    batch, _ = Collator(tok, spec, vocab=vocab).collate([ds[0], ds[1]])

    model = build_model(cfg, vocab)
    params, batch_stats = init_model(model, batch)

    seen_packs = []

    def fake_fused_train(h, xf, instr, gate, src, dst, edge_mask,
                         node_mask, e_attr, params, negative_slope=0.2,
                         apply_mask_to_h=False, interpret=False, pack=None):
        seen_packs.append(pack)
        b, n, _ = h.shape
        c = params["gn_w"].shape[0]
        nheads = params["attb"].shape[1]
        return (jnp.zeros((b, n, c), jnp.float32),
                jnp.zeros((b, src.shape[1], nheads), jnp.float32))

    monkeypatch.setattr(gat_train, "FORCE_INTERPRET", True)
    monkeypatch.setattr(gat_train, "fused_gat_layer_train", fake_fused_train)
    model.apply({"params": params, "batch_stats": batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1),
                      "sampler": jax.random.PRNGKey(2)})
    assert seen_packs == [3, 3, 3, 3], seen_packs


def test_train_kernel_flops_models_pinned():
    """Analytic FLOPs models for the custom-VJP training kernels (the
    benchmark adds these to XLA cost analysis — Pallas kernels are
    invisible to it — so the train-step MFU is exact).  Constants
    pinned at the (32-node, 128-edge) bucket; relations guard against
    accounting regressions."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import (fused_gat_layer_flops,
                                                    metalayer_kernel_flops)
    from isubgvqa_tpu.ops.pallas.gat_train import (fused_gatconv_bwd_flops,
                                                   fused_gatconv_fwd_flops)
    from isubgvqa_tpu.ops.pallas.metalayer_train import metalayer_bwd_flops

    assert fused_gatconv_fwd_flops(32, 128) == 171521024.0
    assert fused_gatconv_bwd_flops(32, 128) == 474113536.0
    assert metalayer_bwd_flops(32, 128) == 553120384.0

    # the conv kernel is the layer minus its XLA head
    assert fused_gatconv_fwd_flops(32, 128) < fused_gat_layer_flops(32, 128)
    # backward = recompute (~1x forward) + reverse chain (> forward)
    assert 2.0 < (fused_gatconv_bwd_flops(32, 128)
                  / fused_gatconv_fwd_flops(32, 128)) < 4.0
    assert 2.0 < (metalayer_bwd_flops(32, 128)
                  / metalayer_kernel_flops(32, 128)) < 4.0
    # monotone in both shape axes
    assert fused_gatconv_bwd_flops(32, 256) > fused_gatconv_bwd_flops(32, 128)
    assert fused_gatconv_bwd_flops(64, 128) > fused_gatconv_bwd_flops(32, 128)
    assert metalayer_bwd_flops(128, 384) > metalayer_bwd_flops(32, 128)


def test_conv_fwd_flops_model_matches_xla_cost_analysis():
    """Cross-validation: the analytic forward-kernel FLOPs model agrees
    with XLA cost analysis of the numerically-identical op-by-op conv
    (dense one-hot matmul formulation) within 1% — the same validation
    discipline as the inference models (bench.py module doc)."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import (gat_conv_reference,
                                                    pack_gat_params)
    from isubgvqa_tpu.ops.pallas.gat_train import fused_gatconv_fwd_flops

    n, e, c, heads = 32, 128, 300, 4
    hc = heads * c
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    gate = jnp.asarray(rng.uniform(size=(2, n, 1)), jnp.float32)
    src = jnp.asarray(rng.integers(0, n, (2, e)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, (2, e)), jnp.int32)
    emask = jnp.ones((2, e), jnp.float32)
    eattr = jnp.asarray(rng.normal(size=(2, e, c)), jnp.float32)
    params = pack_gat_params(
        heads, c,
        jnp.asarray(rng.normal(size=(c, hc)), jnp.float32),
        jnp.zeros((1, hc)),
        jnp.asarray(rng.normal(size=(c, hc)), jnp.float32),
        jnp.zeros((1, hc)),
        jnp.asarray(rng.normal(size=(heads * c,)), jnp.float32),
        jnp.zeros((1, hc)),
        jnp.zeros((hc, hc // 2)), jnp.zeros((1, hc // 2)),
        jnp.zeros((hc // 2, c)), jnp.zeros((1, c)),
        jnp.ones((c,)), jnp.zeros((c,)), jnp.ones((c,)))
    we = jnp.asarray(rng.normal(size=(c, hc)), jnp.float32)

    def f(xf, gate, eattr, we):
        eproj = eattr @ we            # lin_edge, in-kernel in Pallas
        return gat_conv_reference(xf, gate, src, dst, emask, eproj, params)

    ca = jax.jit(f).lower(xf, gate, eattr, we).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla = float(ca["flops"])
    analytic = 2 * fused_gatconv_fwd_flops(n, e, c, heads)   # batch of 2
    assert abs(xla - analytic) / analytic < 0.01, (xla, analytic)
