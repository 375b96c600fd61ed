"""Fused Pallas GAT-layer kernel vs its XLA reference (interpret mode
on CPU) and vs the model's dense-op implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.ops.pallas.gat_kernel import (
    fused_gat_layer,
    gat_layer_reference,
    pack_gat_params,
)


def make_inputs(rng, b=2, n=16, e=40, c=12, heads=4):
    hc = heads * c
    p_dim = heads * c // 2
    h = rng.normal(size=(b, n, c)).astype(np.float32)
    xf = rng.normal(size=(b, n, c)).astype(np.float32)
    instr = rng.normal(size=(b, c)).astype(np.float32)
    node_mask = np.zeros((b, n), bool)
    edge_mask = np.zeros((b, e), bool)
    src = np.zeros((b, e), np.int32)
    dst = np.zeros((b, e), np.int32)
    gate = np.ones((b, n, 1), np.float32)
    for g in range(b):
        nn_ = rng.integers(4, n + 1)
        ne = rng.integers(4, e + 1)
        node_mask[g, :nn_] = True
        edge_mask[g, :ne] = True
        src[g, :ne] = rng.integers(0, nn_, ne)
        dst[g, :ne] = rng.integers(0, nn_, ne)
        gate[g, :, 0] = (rng.random(n) > 0.4).astype(np.float32)
    # the fused kernel projects raw edge features in-kernel through
    # the lin_edge weight at the shipped dtype (f32 here), matching
    # the model's Dense; the reference gets the same projection
    e_attr = rng.normal(size=(b, e, c)).astype(np.float32)
    we = (rng.normal(size=(c, hc)) * 0.2).astype(np.float32)
    params = pack_gat_params(
        heads, c,
        wl=rng.normal(size=(c, hc)).astype(np.float32) * 0.2,
        bl=rng.normal(size=(hc,)).astype(np.float32) * 0.1,
        wr=rng.normal(size=(c, hc)).astype(np.float32) * 0.2,
        br=rng.normal(size=(hc,)).astype(np.float32) * 0.1,
        att=rng.normal(size=(heads, c)).astype(np.float32) * 0.3,
        cbias=rng.normal(size=(hc,)).astype(np.float32) * 0.1,
        w1=rng.normal(size=(hc, p_dim)).astype(np.float32) * 0.1,
        b1=rng.normal(size=(p_dim,)).astype(np.float32) * 0.1,
        w2=rng.normal(size=(p_dim, c)).astype(np.float32) * 0.1,
        b2=rng.normal(size=(c,)).astype(np.float32) * 0.1,
        gn_w=np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5,
        gn_b=rng.normal(size=(c,)).astype(np.float32) * 0.1,
        gn_a=np.ones((c,), np.float32),
    )
    common = dict(
        h=jnp.array(h), xf=jnp.array(xf), instr=jnp.array(instr),
        gate=jnp.array(gate), src=jnp.array(src), dst=jnp.array(dst),
        edge_mask=jnp.array(edge_mask), node_mask=jnp.array(node_mask),
    )
    fused_args = dict(common, e_attr=jnp.array(e_attr),
                      params={**params, "we": jnp.array(we)})
    eproj = (e_attr @ we).astype(np.float32)
    ref_args = dict(common, eproj=jnp.array(eproj), params=params)
    return fused_args, ref_args


@pytest.mark.parametrize("apply_mask", [False, True])
def test_kernel_matches_reference(rng, apply_mask):
    fa, ra = make_inputs(rng)
    out_k, alpha_k = fused_gat_layer(**fa, apply_mask_to_h=apply_mask,
                                     interpret=True)
    out_r, alpha_r = gat_layer_reference(**ra, apply_mask_to_h=apply_mask)
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pack", [1, 2, 3, 4])
def test_graph_packing_is_exact(rng, pack):
    """Packing G graphs per program (block-diagonal incidences +
    [N, G] graph one-hot for SDP/GraphNorm) must be bit-compatible
    with the unpacked kernel, including when B % pack != 0 (padded
    all-masked graphs)."""
    fa, _ = make_inputs(rng, b=5, n=16, e=40)
    out_1, alpha_1 = fused_gat_layer(**fa, interpret=True, pack=1)
    out_p, alpha_p = fused_gat_layer(**fa, interpret=True, pack=pack)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_1),
                               rtol=2e-4, atol=2e-5)


def test_explicit_pack_matches_reference(rng):
    """A packed kernel run must still match the XLA reference."""
    fa, ra = make_inputs(rng, b=6, n=16, e=40)
    out_k, alpha_k = fused_gat_layer(**fa, interpret=True, pack=3)
    out_r, alpha_r = gat_layer_reference(**ra)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)


def test_auto_pack_matches_reference(rng):
    """pack="auto" (the config default) resolves a per-shape packing
    and must stay exact vs the unpacked kernel and the reference."""
    fa, ra = make_inputs(rng, b=7, n=16, e=40)
    out_k, alpha_k = fused_gat_layer(**fa, interpret=True, pack="auto")
    out_r, alpha_r = gat_layer_reference(**ra)
    out_1, _ = fused_gat_layer(**fa, interpret=True, pack=None)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_1),
                               rtol=2e-4, atol=2e-4)


def test_fuse_instr_in_kernel_matches_reference(rng):
    """fuse_instr computes gelu(h * instr) in VMEM; must equal the
    reference fed the externally computed xf (mgat_v2_conv.py:152-157),
    including under graph packing."""
    fa, ra = make_inputs(rng)
    xf = jax.nn.gelu(fa["h"] * fa["instr"][:, None, :], approximate=False)
    ra = dict(ra, xf=xf)
    out_r, alpha_r = gat_layer_reference(**ra)
    for pack in (1, 3):
        fa_f = dict(fa, xf=fa["h"])        # placeholder, kernel ignores
        out_k, alpha_k = fused_gat_layer(**fa_f, interpret=True,
                                         fuse_instr=True, pack=pack)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                                   rtol=2e-4, atol=2e-5)


def test_bf16_ship_path_matches_reference(rng):
    """bf16 inputs exercise the bf16 HBM<->VMEM shipping branch
    (ship=bf16, bf16 refs + bf16 out block) in interpret mode; the
    reference runs on the same bf16-rounded values with bf16-level
    tolerance."""
    fa, ra = make_inputs(rng)
    bf = jnp.bfloat16

    def to_bf(d):
        out = {}
        for k, v in d.items():
            if k == "params":
                out[k] = v
            elif v.dtype == jnp.float32:
                out[k] = v.astype(bf)
            else:
                out[k] = v
        return out

    fa_b = to_bf(fa)
    out_k, alpha_k = fused_gat_layer(**fa_b, interpret=True)
    assert out_k.dtype == bf                      # shipped dtype out
    # reference on the identical bf16-rounded values, f32 compute
    ra_b = {k: (v.astype(jnp.float32) if hasattr(v, "dtype")
                and v.dtype == bf else v)
            for k, v in to_bf(ra).items()}
    ra_b["eproj"] = (fa_b["e_attr"].astype(jnp.float32)
                     @ fa_b["params"]["we"].astype(bf).astype(jnp.float32))
    out_r, alpha_r = gat_layer_reference(**ra_b)
    np.testing.assert_allclose(np.asarray(out_k, dtype=np.float32),
                               np.asarray(out_r, dtype=np.float32),
                               rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-2, atol=2e-2)


def test_alpha_normalized_per_destination(rng):
    args, _ = make_inputs(rng, b=1)
    _, alpha = fused_gat_layer(**args, interpret=True)
    alpha = np.asarray(alpha)[0]
    dst = np.asarray(args["dst"])[0]
    em = np.asarray(args["edge_mask"])[0]
    gate = np.asarray(args["gate"])[0, :, 0]
    src = np.asarray(args["src"])[0]
    for node in set(dst[em].tolist()):
        sel = (dst == node) & em
        s = alpha[sel].sum(0)
        # alpha sums to 1 over incoming edges unless every incoming
        # message was gated to exactly zero (then logits are all equal
        # -> still softmax-normalized)
        np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_masked_rows_are_zeroed(rng):
    args, _ = make_inputs(rng)
    out, alpha = fused_gat_layer(**args, interpret=True)
    nm = np.asarray(args["node_mask"])
    em = np.asarray(args["edge_mask"])
    # padding edges carry zero attention
    assert (np.asarray(alpha)[~em] == 0).all()
    # padding node rows carry only residual + GraphNorm bias (their
    # normalized value is zeroed; downstream ops mask them anyway)
    ref = np.asarray(args["h"]) + np.asarray(args["params"]["gn_b"])
    np.testing.assert_allclose(np.asarray(out)[~nm], ref[~nm],
                               rtol=1e-4, atol=1e-5)


def test_kernel_concat_instr_width(rng):
    """concat_instr doubles xf's width ([B,N,2C]) while edges stay C:
    the kernel's block specs must follow each tensor's own width."""
    fa, ra = make_inputs(rng)
    b, n, c = fa["h"].shape
    hc = fa["params"]["wl"].shape[1]
    ins_b = np.broadcast_to(np.asarray(fa["instr"])[:, None, :], (b, n, c))
    xf2 = jnp.asarray(np.concatenate([np.asarray(fa["xf"]), ins_b], -1))
    wl2 = jnp.asarray(rng.normal(size=(2 * c, hc)).astype(np.float32) * 0.2)
    wr2 = jnp.asarray(rng.normal(size=(2 * c, hc)).astype(np.float32) * 0.2)
    params = dict(fa["params"], wl=wl2, wr=wr2)
    out_k, alpha_k = fused_gat_layer(
        h=fa["h"], xf=xf2, instr=fa["instr"], gate=fa["gate"],
        src=fa["src"], dst=fa["dst"], edge_mask=fa["edge_mask"],
        node_mask=fa["node_mask"], e_attr=fa["e_attr"], params=params,
        interpret=True)
    eproj = jnp.einsum("bec,ch->beh", fa["e_attr"], params["we"])
    out_r, alpha_r = gat_layer_reference(
        h=fa["h"], xf=xf2, instr=fa["instr"], gate=fa["gate"],
        src=fa["src"], dst=fa["dst"], edge_mask=fa["edge_mask"],
        node_mask=fa["node_mask"], eproj=eproj,
        params={k: v for k, v in params.items() if k != "we"})
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha_k), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)


def test_analytic_flops_model_pinned():
    """Regression pin for the analytic kernel FLOP models
    (bench.py's exact-MFU accounting).  Validated on hardware against
    the op-by-op XLA path's cost analysis at (B=128, N=32, E=128):
    XLA-visible 74.2 GF + these models 141.5 GF = 215.7 GF vs 218.1 GF
    total (within ~1%; the remainder is the masked layer's sampler
    head, which runs in XLA)."""
    from isubgvqa_tpu.ops.pallas.gat_kernel import (fused_gat_layer_flops,
                                                    metalayer_kernel_flops)

    assert fused_gat_layer_flops(32, 128) == 229601152.0
    assert fused_gat_layer_flops(32, 128, fuse_instr=True) == 229716352.0
    assert metalayer_kernel_flops(32, 128) == 187081984.0
    # scaling sanity: strictly increasing in E and N
    assert fused_gat_layer_flops(32, 256) > fused_gat_layer_flops(32, 128)
    assert fused_gat_layer_flops(128, 128) > fused_gat_layer_flops(32, 128)
    assert metalayer_kernel_flops(128, 384) > metalayer_kernel_flops(32, 128)


def test_pack_with_wide_xf(rng):
    """concat_instr makes xf [B, N, 2C] while h stays [B, N, C]
    (mgat_v2_conv.py:154-155); the pack path must reshape xf by its
    own width, and the packed kernel must match unpacked + reference."""
    fa, ra = make_inputs(rng, b=4, n=16, e=40)
    c = fa["h"].shape[-1]
    hc = fa["params"]["wl"].shape[1]
    r2 = np.random.default_rng(7)
    wl2 = (r2.normal(size=(2 * c, hc)) * 0.2).astype(np.float32)
    wr2 = (r2.normal(size=(2 * c, hc)) * 0.2).astype(np.float32)
    xf_wide = jnp.concatenate([fa["xf"], fa["h"]], axis=-1)
    fa = dict(fa, xf=xf_wide,
              params={**fa["params"], "wl": jnp.array(wl2),
                      "wr": jnp.array(wr2)})
    ra = dict(ra, xf=xf_wide,
              params={**ra["params"], "wl": jnp.array(wl2),
                      "wr": jnp.array(wr2)})
    out_1, alpha_1 = fused_gat_layer(**fa, interpret=True, pack=1)
    out_p, alpha_p = fused_gat_layer(**fa, interpret=True, pack=2)
    out_r, alpha_r = gat_layer_reference(**ra)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_r),
                               rtol=2e-4, atol=2e-5)


def test_kernel_pack_config_reaches_fused_layer(monkeypatch):
    """cfg.kernel_pack plumbing: every MGAT layer passes the knob to
    fused_gat_layer at inference.  The kernel itself is faked (the real
    fused path is TPU-only; packed exactness is pinned above), and the
    TPU gate is spoofed so run_fused turns on under the CPU tests."""
    from isubgvqa_tpu.models import mgat as mgat_mod
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

    def fake_fused(*, h, xf, instr, gate, src, dst, edge_mask, node_mask,
                   e_attr, params, negative_slope, apply_mask_to_h,
                   fuse_instr, pack=None):
        seen_packs.append(pack)
        b, n, _ = h.shape
        c = params["gn_w"].shape[0]
        nheads = params["attb"].shape[1]
        return (jnp.zeros((b, n, c), h.dtype),
                jnp.zeros((b, src.shape[1], nheads), jnp.float32))

    monkeypatch.setattr(mgat_mod, "fused_gat_layer", fake_fused)
    # spoof ONLY the MGAT gate (module-local _on_tpu seam): the
    # scene-graph encoder and the question stack keep their XLA paths,
    # which are the only ones compilable on the CPU test mesh
    monkeypatch.setattr(mgat_mod, "_on_tpu", lambda: True)
    model.apply({"params": params, "batch_stats": batch_stats},
                batch, train=False, rngs={"sampler": jax.random.PRNGKey(0)})
    assert seen_packs == [3, 3, 3, 3], seen_packs
