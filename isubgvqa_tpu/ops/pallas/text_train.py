"""Differentiable fused transformer layers — the Pallas *training* path
of the question stack.

The eval kernels (:mod:`.text_kernel`) fuse a whole post-LN
encoder/decoder layer per grid program but carry no backward, so
training previously ran the op-by-op XLA composition
(``models/layers.py``) — profiled as LayerNorm-reduction / layout-copy
bound, not FLOPs bound (see ``text_kernel`` module doc), and in a
training step its forward+backward costs roughly as much as the whole
fused graph side (~1.75 GFLOPs/question at L=16 vs ~1.76 for the four
GAT convs).

This module gives each layer a :func:`jax.custom_vjp` built from two
Pallas kernels, exactly like the graph convs (:mod:`.gat_train`):

* **forward** — the eval kernel's math plus dropout, where the dropout
  *keep masks* are drawn XLA-side (``models/layers.py`` draws them with
  the module's ``dropout`` RNG stream) and passed in as inputs, so the
  fused path and the XLA fallback share masks by construction and the
  gradient tests have an exact oracle;
* **backward** — one program per question pack that recomputes the
  forward in VMEM from the saved inputs (+ masks) and walks the chain
  in reverse: LayerNorm backward, FFN, softmax/attention backward, QKV
  projections.  Residuals are only the layer inputs and the masks — no
  ``[B, H, L, L]`` probability tensor or ``[B, L, F]`` FFN activation
  ever reaches HBM.  Parameter gradients accumulate across the
  (sequential) TPU grid into shared output blocks.

Dropout sites per layer (torch ``TransformerEncoderLayer`` /
``TransformerDecoderLayer`` parity, reference
``question_encoder.py:22-25`` / ``question_decoder.py:27-29``):
attention probabilities (inside each MHA), after each attention output,
after the FFN's ReLU, and after the FFN output.  Masks hold the scaled
keep values ``{0, 1/(1-p)}`` at the model dtype.

The reference's additive float key-padding-mask quirk is reproduced in
the encoder's self-attention (``colbias``), as in the eval kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .text_kernel import _NEG, _block_mask, _pad_batch, _row_budget

# Test escape hatch (same pattern as gat_train.FORCE_INTERPRET): forces
# the fused training path on (interpret-mode kernels) off-TPU so the
# model-level wiring can be exercised on the CPU test mesh.
FORCE_INTERPRET = False

_LN_EPS = 1e-6
_ENC_W = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
          "n1s", "n1b", "w1", "b1", "w2", "b2", "n2s", "n2b")
_DEC_W = ("swq", "sbq", "swk", "sbk", "swv", "sbv", "swo", "sbo",
          "n1s", "n1b",
          "cwq", "cbq", "cwk", "cbk", "cwv", "cbv", "cwo", "cbo",
          "n2s", "n2b", "w1", "b1", "w2", "b2", "n3s", "n3b")
_ENC_MASKS = ("attn", "post_attn", "ffn", "post_ffn")
_DEC_MASKS = ("self_attn", "post_sa", "cross_attn", "post_ca",
              "ffn", "post_ffn")


# --------------------------------------------------------------------
# shared in-kernel math
# --------------------------------------------------------------------

def _tile_cols(m, per_k: int, rk: int):
    """``[R, per_k]`` -> ``[R, rk]`` with column ``c`` reading
    ``m[:, c % per_k]`` — broadcasts a per-question mask slice across a
    pack's block-diagonal score columns via one small MXU matmul
    (S[j, c] = 1 iff c % per_k == j)."""
    f32 = jnp.float32
    colmod = jax.lax.broadcasted_iota(jnp.int32, (per_k, rk), 1) % per_k
    rowj = jax.lax.broadcasted_iota(jnp.int32, (per_k, rk), 0)
    s = (colmod == rowj).astype(f32)
    return jnp.dot(m, s, preferred_element_type=f32)


def _ln_fwd(z, s_ref, b_ref):
    """flax LayerNorm fast-variance math; returns (y, zhat, r) for the
    backward."""
    f32 = jnp.float32
    mean = jnp.mean(z, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(z * z, axis=1, keepdims=True) - mean * mean,
                      0.0)
    r = jax.lax.rsqrt(var + _LN_EPS)
    zhat = (z - mean) * r
    y = zhat * s_ref[:].astype(f32) + b_ref[:].astype(f32)
    return y, zhat, r


def _ln_bwd(g, zhat, r, s_ref):
    """Backward of ``y = zhat·s + b``: returns (dz, ds_row, db_row)
    where ds/db are this block's contributions (summed over rows)."""
    f32 = jnp.float32
    gs = g * s_ref[:].astype(f32)
    m1 = jnp.mean(gs, axis=1, keepdims=True)
    m2 = jnp.mean(gs * zhat, axis=1, keepdims=True)
    dz = r * (gs - m1 - zhat * m2)
    ds = jnp.sum(g * zhat, axis=0, keepdims=True)
    db = jnp.sum(g, axis=0, keepdims=True)
    return dz, ds, db


def _mha_fwd(q_in, kv_in, colbias, blockmask, probs_keep, per_k,
             wq, bq, wk, bk, wv, bv, wo, bo, num_heads: int):
    """MHA forward storing per-head intermediates for reuse in the
    backward recompute.  ``probs_keep [Rq, H·per_k] | None`` holds the
    scaled attention-probability keep mask (own-block column layout).
    Returns ``(out [Rq, D] f32, saved)``."""
    f32 = jnp.float32
    wdt = wq.dtype
    d = wq.shape[1]
    dh = d // num_heads
    scale = 1.0 / math.sqrt(dh)
    rk = kv_in.shape[0]

    def proj(x, w, b):
        return (jnp.dot(x.astype(wdt), w[:], preferred_element_type=f32)
                + b[:].astype(f32))

    q = proj(q_in, wq, bq)
    k = proj(kv_in, wk, bk)
    v = proj(kv_in, wv, bv)

    heads = []
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jnp.dot(qh.astype(wdt), kh.astype(wdt).T,
                     preferred_element_type=f32) * scale
        if colbias is not None:
            sc = sc + colbias[None, :]
        sc = sc + blockmask
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        if probs_keep is not None:
            tiled = _tile_cols(
                probs_keep[:, h * per_k:(h + 1) * per_k].astype(f32),
                per_k, rk)
            pd = p * tiled
        else:
            tiled = None
            pd = p
        outs.append(jnp.dot(pd.astype(wdt), vh.astype(wdt),
                            preferred_element_type=f32))
        heads.append((p, tiled))
    ocat = jnp.concatenate(outs, axis=1)
    out = (jnp.dot(ocat.astype(wdt), wo[:], preferred_element_type=f32)
           + bo[:].astype(f32))
    return out, {"q": q, "k": k, "v": v, "heads": heads, "ocat": ocat,
                 "scale": scale, "dh": dh}


def _mha_bwd(dout, q_in, kv_in, saved, wq, wk, wv, wo, num_heads: int):
    """Backward of :func:`_mha_fwd`.  Returns
    ``(dq_in, dkv_in, param-grad dict keyed wq..bo)`` — caller merges
    ``dq_in``/``dkv_in`` when q_in is kv_in (self-attention)."""
    f32 = jnp.float32
    q, k, v = saved["q"], saved["k"], saved["v"]
    dh, scale = saved["dh"], saved["scale"]

    wo_f = wo[:].astype(f32)
    grads = {}
    grads["bo"] = jnp.sum(dout, axis=0, keepdims=True)
    grads["wo"] = jnp.dot(saved["ocat"].T, dout, preferred_element_type=f32)
    docat = jnp.dot(dout, wo_f.T, preferred_element_type=f32)

    dq = []
    dk = []
    dv = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p, tiled = saved["heads"][h]
        pd = p * tiled if tiled is not None else p
        do_h = docat[:, sl]
        d_pd = jnp.dot(do_h, v[:, sl].T, preferred_element_type=f32)
        dv.append(jnp.dot(pd.T, do_h, preferred_element_type=f32))
        dp = d_pd * tiled if tiled is not None else d_pd
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dq.append(jnp.dot(ds, k[:, sl], preferred_element_type=f32) * scale)
        dk.append(jnp.dot(ds.T, q[:, sl], preferred_element_type=f32) * scale)
    dq = jnp.concatenate(dq, axis=1)
    dk = jnp.concatenate(dk, axis=1)
    dv = jnp.concatenate(dv, axis=1)

    qf32 = q_in  # already f32
    kvf32 = kv_in
    grads["wq"] = jnp.dot(qf32.T, dq, preferred_element_type=f32)
    grads["bq"] = jnp.sum(dq, axis=0, keepdims=True)
    grads["wk"] = jnp.dot(kvf32.T, dk, preferred_element_type=f32)
    grads["bk"] = jnp.sum(dk, axis=0, keepdims=True)
    grads["wv"] = jnp.dot(kvf32.T, dv, preferred_element_type=f32)
    grads["bv"] = jnp.sum(dv, axis=0, keepdims=True)

    dq_in = jnp.dot(dq, wq[:].astype(f32).T, preferred_element_type=f32)
    dkv_in = (jnp.dot(dk, wk[:].astype(f32).T, preferred_element_type=f32)
              + jnp.dot(dv, wv[:].astype(f32).T, preferred_element_type=f32))
    return dq_in, dkv_in, grads


def _mul_mask(x, m_ref):
    return x * m_ref[:].astype(jnp.float32) if m_ref is not None else x


# --------------------------------------------------------------------
# encoder layer kernels
# --------------------------------------------------------------------

def _make_enc_fwd(tokens: int, num_heads: int, with_masks: bool):
    def kernel(*refs):
        f32 = jnp.float32
        x_ref, kb_ref = refs[0], refs[1]
        i = 2
        mattn = m1 = mf = m2 = None
        if with_masks:
            mattn, m1, mf, m2 = refs[2:6]
            i = 6
        (wq, bq, wk, bk, wv, bv, wo, bo, n1s, n1b,
         w1, b1, w2, b2, n2s, n2b) = refs[i:i + 16]
        out_ref = refs[-1]

        r = x_ref.shape[0]
        x = x_ref[:].astype(f32)
        bm = _block_mask(r, tokens, r, tokens)
        colbias = kb_ref[:].astype(f32)[:, 0]

        attn, _ = _mha_fwd(x, x, colbias, bm,
                           mattn[:] if mattn is not None else None,
                           tokens, wq, bq, wk, bk, wv, bv, wo, bo,
                           num_heads)
        attn = _mul_mask(attn, m1)
        h1, _, _ = _ln_fwd(x + attn, n1s, n1b)
        wdt = w1.dtype
        f1 = (jnp.dot(h1.astype(wdt), w1[:], preferred_element_type=f32)
              + b1[:].astype(f32))
        fa = jnp.maximum(f1, 0.0)
        fa = _mul_mask(fa, mf)
        f2 = (jnp.dot(fa.astype(wdt), w2[:], preferred_element_type=f32)
              + b2[:].astype(f32))
        f2 = _mul_mask(f2, m2)
        y, _, _ = _ln_fwd(h1 + f2, n2s, n2b)
        out_ref[:] = y.astype(out_ref.dtype)

    return kernel


def _make_enc_bwd(tokens: int, num_heads: int, with_masks: bool):
    def kernel(*refs):
        f32 = jnp.float32
        x_ref, kb_ref = refs[0], refs[1]
        i = 2
        mattn = m1 = mf = m2 = None
        if with_masks:
            mattn, m1, mf, m2 = refs[2:6]
            i = 6
        (wq, bq, wk, bk, wv, bv, wo, bo, n1s, n1b,
         w1, b1, w2, b2, n2s, n2b) = refs[i:i + 16]
        g_ref = refs[i + 16]
        dx_ref = refs[i + 17]
        gout = refs[i + 18:]
        assert len(gout) == 16

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for o in gout:
                o[:] = jnp.zeros_like(o)

        (gwq, gbq, gwk, gbk, gwv, gbv, gwo, gbo, gn1s, gn1b,
         gw1, gb1, gw2, gb2, gn2s, gn2b) = gout

        # ---- recompute the forward, keeping intermediates
        r = x_ref.shape[0]
        x = x_ref[:].astype(f32)
        bm = _block_mask(r, tokens, r, tokens)
        colbias = kb_ref[:].astype(f32)[:, 0]

        attn, saved = _mha_fwd(x, x, colbias, bm,
                               mattn[:] if mattn is not None else None,
                               tokens, wq, bq, wk, bk, wv, bv, wo, bo,
                               num_heads)
        attn_d = _mul_mask(attn, m1)
        z1 = x + attn_d
        h1, zhat1, r1 = _ln_fwd(z1, n1s, n1b)
        wdt = w1.dtype
        f1 = (jnp.dot(h1.astype(wdt), w1[:], preferred_element_type=f32)
              + b1[:].astype(f32))
        fa = jnp.maximum(f1, 0.0)
        fad = _mul_mask(fa, mf)
        f2 = (jnp.dot(fad.astype(wdt), w2[:], preferred_element_type=f32)
              + b2[:].astype(f32))
        f2d = _mul_mask(f2, m2)
        z2 = h1 + f2d
        _, zhat2, r2 = _ln_fwd(z2, n2s, n2b)

        # ---- reverse
        g = g_ref[:].astype(f32)
        dz2, ds2, db2 = _ln_bwd(g, zhat2, r2, n2s)
        gn2s[:] += ds2
        gn2b[:] += db2
        df2 = _mul_mask(dz2, m2)
        gw2[:] += jnp.dot(fad.T, df2, preferred_element_type=f32)
        gb2[:] += jnp.sum(df2, axis=0, keepdims=True)
        dfa = jnp.dot(df2, w2[:].astype(f32).T, preferred_element_type=f32)
        dfa = _mul_mask(dfa, mf)
        df1 = dfa * (f1 > 0).astype(f32)
        gw1[:] += jnp.dot(h1.T, df1, preferred_element_type=f32)
        gb1[:] += jnp.sum(df1, axis=0, keepdims=True)
        dh1 = dz2 + jnp.dot(df1, w1[:].astype(f32).T,
                            preferred_element_type=f32)
        dz1, ds1, db1 = _ln_bwd(dh1, zhat1, r1, n1s)
        gn1s[:] += ds1
        gn1b[:] += db1
        dattn = _mul_mask(dz1, m1)
        dq_in, dkv_in, mg = _mha_bwd(dattn, x, x, saved,
                                     wq, wk, wv, wo, num_heads)
        gwq[:] += mg["wq"]
        gbq[:] += mg["bq"]
        gwk[:] += mg["wk"]
        gbk[:] += mg["bk"]
        gwv[:] += mg["wv"]
        gbv[:] += mg["bv"]
        gwo[:] += mg["wo"]
        gbo[:] += mg["bo"]
        dx_ref[:] = dz1 + dq_in + dkv_in

    return kernel


# --------------------------------------------------------------------
# decoder layer kernels
# --------------------------------------------------------------------

def _make_dec_fwd(queries: int, tokens: int, num_heads: int,
                  with_masks: bool):
    def kernel(*refs):
        f32 = jnp.float32
        t_ref, mem_ref = refs[0], refs[1]
        i = 2
        msa = m1 = mca = m2 = mf = m3 = None
        if with_masks:
            msa, m1, mca, m2, mf, m3 = refs[2:8]
            i = 8
        (swq, sbq, swk, sbk, swv, sbv, swo, sbo, n1s, n1b,
         cwq, cbq, cwk, cbk, cwv, cbv, cwo, cbo, n2s, n2b,
         w1, b1, w2, b2, n3s, n3b) = refs[i:i + 26]
        out_ref = refs[-1]

        rt = t_ref.shape[0]
        rm = mem_ref.shape[0]
        tgt = t_ref[:].astype(f32)
        mem = mem_ref[:].astype(f32)

        sa, _ = _mha_fwd(tgt, tgt, None,
                         _block_mask(rt, queries, rt, queries),
                         msa[:] if msa is not None else None, queries,
                         swq, sbq, swk, sbk, swv, sbv, swo, sbo, num_heads)
        sa = _mul_mask(sa, m1)
        t1, _, _ = _ln_fwd(tgt + sa, n1s, n1b)
        ca, _ = _mha_fwd(t1, mem, None,
                         _block_mask(rt, queries, rm, tokens),
                         mca[:] if mca is not None else None, tokens,
                         cwq, cbq, cwk, cbk, cwv, cbv, cwo, cbo, num_heads)
        ca = _mul_mask(ca, m2)
        t2, _, _ = _ln_fwd(t1 + ca, n2s, n2b)
        wdt = w1.dtype
        f1 = (jnp.dot(t2.astype(wdt), w1[:], preferred_element_type=f32)
              + b1[:].astype(f32))
        fa = jnp.maximum(f1, 0.0)
        fa = _mul_mask(fa, mf)
        f2 = (jnp.dot(fa.astype(wdt), w2[:], preferred_element_type=f32)
              + b2[:].astype(f32))
        f2 = _mul_mask(f2, m3)
        y, _, _ = _ln_fwd(t2 + f2, n3s, n3b)
        out_ref[:] = y.astype(out_ref.dtype)

    return kernel


def _make_dec_bwd(queries: int, tokens: int, num_heads: int,
                  with_masks: bool):
    def kernel(*refs):
        f32 = jnp.float32
        t_ref, mem_ref = refs[0], refs[1]
        i = 2
        msa = m1 = mca = m2 = mf = m3 = None
        if with_masks:
            msa, m1, mca, m2, mf, m3 = refs[2:8]
            i = 8
        (swq, sbq, swk, sbk, swv, sbv, swo, sbo, n1s, n1b,
         cwq, cbq, cwk, cbk, cwv, cbv, cwo, cbo, n2s, n2b,
         w1, b1, w2, b2, n3s, n3b) = refs[i:i + 26]
        g_ref = refs[i + 26]
        dt_ref = refs[i + 27]
        dmem_ref = refs[i + 28]
        gout = refs[i + 29:]
        assert len(gout) == 26

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for o in gout:
                o[:] = jnp.zeros_like(o)

        (gswq, gsbq, gswk, gsbk, gswv, gsbv, gswo, gsbo, gn1s, gn1b,
         gcwq, gcbq, gcwk, gcbk, gcwv, gcbv, gcwo, gcbo, gn2s, gn2b,
         gw1, gb1, gw2, gb2, gn3s, gn3b) = gout

        # ---- recompute
        rt = t_ref.shape[0]
        rm = mem_ref.shape[0]
        tgt = t_ref[:].astype(f32)
        mem = mem_ref[:].astype(f32)

        sa, saved_s = _mha_fwd(tgt, tgt, None,
                               _block_mask(rt, queries, rt, queries),
                               msa[:] if msa is not None else None, queries,
                               swq, sbq, swk, sbk, swv, sbv, swo, sbo,
                               num_heads)
        sa_d = _mul_mask(sa, m1)
        z1 = tgt + sa_d
        t1, zhat1, r1 = _ln_fwd(z1, n1s, n1b)
        ca, saved_c = _mha_fwd(t1, mem, None,
                               _block_mask(rt, queries, rm, tokens),
                               mca[:] if mca is not None else None, tokens,
                               cwq, cbq, cwk, cbk, cwv, cbv, cwo, cbo,
                               num_heads)
        ca_d = _mul_mask(ca, m2)
        z2 = t1 + ca_d
        t2, zhat2, r2 = _ln_fwd(z2, n2s, n2b)
        wdt = w1.dtype
        f1 = (jnp.dot(t2.astype(wdt), w1[:], preferred_element_type=f32)
              + b1[:].astype(f32))
        fa = jnp.maximum(f1, 0.0)
        fad = _mul_mask(fa, mf)
        f2 = (jnp.dot(fad.astype(wdt), w2[:], preferred_element_type=f32)
              + b2[:].astype(f32))
        f2d = _mul_mask(f2, m3)
        z3 = t2 + f2d
        _, zhat3, r3 = _ln_fwd(z3, n3s, n3b)

        # ---- reverse
        g = g_ref[:].astype(f32)
        dz3, ds3, db3 = _ln_bwd(g, zhat3, r3, n3s)
        gn3s[:] += ds3
        gn3b[:] += db3
        df2 = _mul_mask(dz3, m3)
        gw2[:] += jnp.dot(fad.T, df2, preferred_element_type=f32)
        gb2[:] += jnp.sum(df2, axis=0, keepdims=True)
        dfa = jnp.dot(df2, w2[:].astype(f32).T, preferred_element_type=f32)
        dfa = _mul_mask(dfa, mf)
        df1 = dfa * (f1 > 0).astype(f32)
        gw1[:] += jnp.dot(t2.T, df1, preferred_element_type=f32)
        gb1[:] += jnp.sum(df1, axis=0, keepdims=True)
        dt2 = dz3 + jnp.dot(df1, w1[:].astype(f32).T,
                            preferred_element_type=f32)
        dz2, ds2, db2 = _ln_bwd(dt2, zhat2, r2, n2s)
        gn2s[:] += ds2
        gn2b[:] += db2
        dca = _mul_mask(dz2, m2)
        dq_c, dmem, cg = _mha_bwd(dca, t1, mem, saved_c,
                                  cwq, cwk, cwv, cwo, num_heads)
        gcwq[:] += cg["wq"]
        gcbq[:] += cg["bq"]
        gcwk[:] += cg["wk"]
        gcbk[:] += cg["bk"]
        gcwv[:] += cg["wv"]
        gcbv[:] += cg["bv"]
        gcwo[:] += cg["wo"]
        gcbo[:] += cg["bo"]
        dmem_ref[:] = dmem
        dt1 = dz2 + dq_c
        dz1, ds1, db1 = _ln_bwd(dt1, zhat1, r1, n1s)
        gn1s[:] += ds1
        gn1b[:] += db1
        dsa = _mul_mask(dz1, m1)
        dq_s, dkv_s, sg = _mha_bwd(dsa, tgt, tgt, saved_s,
                                   swq, swk, swv, swo, num_heads)
        gswq[:] += sg["wq"]
        gsbq[:] += sg["bq"]
        gswk[:] += sg["wk"]
        gsbk[:] += sg["bk"]
        gswv[:] += sg["wv"]
        gsbv[:] += sg["bv"]
        gswo[:] += sg["wo"]
        gsbo[:] += sg["bo"]
        dt_ref[:] = dz1 + dq_s + dkv_s

    return kernel


# --------------------------------------------------------------------
# wrappers
# --------------------------------------------------------------------

def _bcast_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _in2(shape):
    return pl.BlockSpec((None,) + shape, lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _ship_weights(params, order, ship):
    """Weight matrices at the model dtype (Dense rounding parity);
    biases / LN vectors f32 as ``[1, W]`` rows."""
    f32 = jnp.float32
    arrs, specs = [], []
    for name in order:
        a = params[name]
        if a.ndim == 2:
            arrs.append(a.astype(ship))
            specs.append(_bcast_spec(a.shape))
        else:
            arrs.append(a[None].astype(f32))
            specs.append(_bcast_spec((1, a.shape[0])))
    return arrs, specs


def _attn_mask_rows(m, g, tb):
    """``[B, H, Lq, Lk]`` -> ``[g, TB·Lq, H·Lk]`` own-block layout
    (row ``t·Lq + i`` of program ``p`` reads question ``p·TB + t``)."""
    b, h, lq, lk = m.shape
    return m.transpose(0, 2, 1, 3).reshape(g, tb * lq, h * lk)


def _rows(m, g):
    """``[B, L, W]`` -> ``[g, TB·L, W]``."""
    b, l, w = m.shape
    return m.reshape(g, (b // g) * l, w)


def _compiler_params(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)


def _enc_call(x, key_mask, masks, params, num_heads, interpret, want_grads,
              g_out=None):
    """Shared encoder dispatch for fwd (want_grads=False) and bwd."""
    b, l, d = x.shape
    f = params["w1"].shape[1]
    f32 = jnp.float32
    ship = jnp.bfloat16 if x.dtype == jnp.bfloat16 else f32
    tb = max(_row_budget(ship) // l, 1)
    with_masks = masks is not None

    pad_in = [x, key_mask]
    if with_masks:
        pad_in += [masks["attn"], masks["post_attn"], masks["ffn"],
                   masks["post_ffn"]]
    if want_grads:
        pad_in.append(g_out)
    bp, padded = _pad_batch(b, tb, *pad_in)
    g = bp // tb
    r = tb * l

    x_p, km_p = padded[0], padded[1]
    args = [x_p.reshape(g, r, d).astype(ship),
            km_p.astype(f32).reshape(g, r, 1)]
    specs = [_in2((r, d)), _in2((r, 1))]
    if with_masks:
        ma, m1, mf, m2 = padded[2:6]
        args += [_attn_mask_rows(ma.astype(ship), g, tb),
                 _rows(m1.astype(ship), g), _rows(mf.astype(ship), g),
                 _rows(m2.astype(ship), g)]
        specs += [_in2((r, num_heads * l)), _in2((r, d)), _in2((r, f)),
                  _in2((r, d))]
    warrs, wspecs = _ship_weights(params, _ENC_W, ship)
    args += warrs
    specs += wspecs

    if not want_grads:
        out = pl.pallas_call(
            _make_enc_fwd(l, num_heads, with_masks),
            grid=(g,),
            compiler_params=_compiler_params(interpret),
            in_specs=specs,
            out_specs=pl.BlockSpec((None, r, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, r, d), ship),
            interpret=interpret,
        )(*args)
        return out.reshape(bp, l, d)[:b].astype(x.dtype)

    args.append(padded[-1].astype(f32).reshape(g, r, d))
    specs.append(_in2((r, d)))
    gshapes = [params[k].shape if params[k].ndim == 2 else
               (1, params[k].shape[0]) for k in _ENC_W]
    outs = pl.pallas_call(
        _make_enc_bwd(l, num_heads, with_masks),
        grid=(g,),
        compiler_params=_compiler_params(interpret),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((None, r, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(_bcast_spec(s) for s in gshapes),
        out_shape=(
            jax.ShapeDtypeStruct((g, r, d), f32),
        ) + tuple(jax.ShapeDtypeStruct(s, f32) for s in gshapes),
        interpret=interpret,
    )(*args)
    dx = outs[0].reshape(bp, l, d)[:b]
    dparams = {}
    for k, grad in zip(_ENC_W, outs[1:]):
        dparams[k] = (grad if params[k].ndim == 2 else grad[0]).astype(
            params[k].dtype)
    return dx.astype(x.dtype), dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_encoder_layer_train(x, key_mask, masks, params, num_heads=8,
                              interpret=False):
    """One post-LN transformer encoder layer with live dropout, fused,
    differentiable.

    ``x [B, L, D]``; ``key_mask [B, L]`` float (the reference's additive
    key-logit bias); ``masks`` None or a dict of scaled keep masks
    (keys ``attn [B,H,L,L]``, ``post_attn [B,L,D]``, ``ffn [B,L,F]``,
    ``post_ffn [B,L,D]``) drawn by the caller; ``params`` keyed as
    ``PostLNTransformerLayer.kernel_params()``.  Gradients are defined
    for ``x`` and every params leaf (masks/key_mask get zeros); matches
    ``jax.grad`` of :func:`~isubgvqa_tpu.models.layers.
    encoder_layer_reference` to f32 accuracy
    (``tests/test_text_train.py``).
    """
    return _enc_call(x, key_mask, masks, params, num_heads, interpret,
                     want_grads=False)


def _enc_vjp_fwd(x, key_mask, masks, params, num_heads, interpret):
    out = _enc_call(x, key_mask, masks, params, num_heads, interpret,
                    want_grads=False)
    return out, (x, key_mask, masks, params)


def _enc_vjp_bwd(num_heads, interpret, residuals, g):
    x, key_mask, masks, params = residuals
    dx, dparams = _enc_call(x, key_mask, masks, params, num_heads,
                            interpret, want_grads=True,
                            g_out=g.astype(jnp.float32))
    dmasks = (None if masks is None
              else {k: jnp.zeros_like(v) for k, v in masks.items()})
    return dx, jnp.zeros_like(key_mask), dmasks, dparams


fused_encoder_layer_train.defvjp(_enc_vjp_fwd, _enc_vjp_bwd)


def _dec_call(tgt, memory, masks, params, num_heads, interpret,
              want_grads, g_out=None):
    b, t, d = tgt.shape
    l = memory.shape[1]
    f = params["w1"].shape[1]
    f32 = jnp.float32
    ship = jnp.bfloat16 if memory.dtype == jnp.bfloat16 else f32
    tb = max(_row_budget(ship) // l, 1)
    with_masks = masks is not None

    pad_in = [tgt, memory]
    if with_masks:
        pad_in += [masks["self_attn"], masks["post_sa"],
                   masks["cross_attn"], masks["post_ca"],
                   masks["ffn"], masks["post_ffn"]]
    if want_grads:
        pad_in.append(g_out)
    bp, padded = _pad_batch(b, tb, *pad_in)
    g = bp // tb
    rt, rm = tb * t, tb * l

    args = [padded[0].reshape(g, rt, d).astype(ship),
            padded[1].reshape(g, rm, d).astype(ship)]
    specs = [_in2((rt, d)), _in2((rm, d))]
    if with_masks:
        msa, m1, mca, m2, mf, m3 = padded[2:8]
        args += [_attn_mask_rows(msa.astype(ship), g, tb),
                 _rows(m1.astype(ship), g),
                 _attn_mask_rows(mca.astype(ship), g, tb),
                 _rows(m2.astype(ship), g), _rows(mf.astype(ship), g),
                 _rows(m3.astype(ship), g)]
        specs += [_in2((rt, num_heads * t)), _in2((rt, d)),
                  _in2((rt, num_heads * l)), _in2((rt, d)),
                  _in2((rt, f)), _in2((rt, d))]
    warrs, wspecs = _ship_weights(params, _DEC_W, ship)
    args += warrs
    specs += wspecs

    if not want_grads:
        out = pl.pallas_call(
            _make_dec_fwd(t, l, num_heads, with_masks),
            grid=(g,),
            compiler_params=_compiler_params(interpret),
            in_specs=specs,
            out_specs=pl.BlockSpec((None, rt, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, rt, d), ship),
            interpret=interpret,
        )(*args)
        return out.reshape(bp, t, d)[:b].astype(tgt.dtype)

    args.append(padded[-1].astype(f32).reshape(g, rt, d))
    specs.append(_in2((rt, d)))
    gshapes = [params[k].shape if params[k].ndim == 2 else
               (1, params[k].shape[0]) for k in _DEC_W]
    outs = pl.pallas_call(
        _make_dec_bwd(t, l, num_heads, with_masks),
        grid=(g,),
        compiler_params=_compiler_params(interpret),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((None, rt, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rm, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(_bcast_spec(s) for s in gshapes),
        out_shape=(
            jax.ShapeDtypeStruct((g, rt, d), f32),
            jax.ShapeDtypeStruct((g, rm, d), f32),
        ) + tuple(jax.ShapeDtypeStruct(s, f32) for s in gshapes),
        interpret=interpret,
    )(*args)
    dtgt = outs[0].reshape(bp, t, d)[:b]
    dmem = outs[1].reshape(bp, l, d)[:b]
    dparams = {}
    for k, grad in zip(_DEC_W, outs[2:]):
        dparams[k] = (grad if params[k].ndim == 2 else grad[0]).astype(
            params[k].dtype)
    return dtgt.astype(tgt.dtype), dmem.astype(memory.dtype), dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_decoder_layer_train(tgt, memory, masks, params, num_heads=8,
                              interpret=False):
    """One post-LN transformer decoder layer (self-attn over the learned
    queries + cross-attn to the question memory + FFN) with live
    dropout, fused, differentiable.  ``masks`` None or a dict with keys
    ``self_attn [B,H,T,T]``, ``post_sa [B,T,D]``, ``cross_attn
    [B,H,T,L]``, ``post_ca [B,T,D]``, ``ffn [B,T,F]``, ``post_ffn
    [B,T,D]``.  Returns ``[B, T, D]``; gradients flow to ``tgt``,
    ``memory`` and every params leaf."""
    return _dec_call(tgt, memory, masks, params, num_heads, interpret,
                     want_grads=False)


def _dec_vjp_fwd(tgt, memory, masks, params, num_heads, interpret):
    out = _dec_call(tgt, memory, masks, params, num_heads, interpret,
                    want_grads=False)
    return out, (tgt, memory, masks, params)


def _dec_vjp_bwd(num_heads, interpret, residuals, g):
    tgt, memory, masks, params = residuals
    dtgt, dmem, dparams = _dec_call(tgt, memory, masks, params, num_heads,
                                    interpret, want_grads=True,
                                    g_out=g.astype(jnp.float32))
    dmasks = (None if masks is None
              else {k: jnp.zeros_like(v) for k, v in masks.items()})
    return dtgt, dmem, dmasks, dparams


fused_decoder_layer_train.defvjp(_dec_vjp_fwd, _dec_vjp_bwd)


# --------------------------------------------------------------------
# analytic FLOPs (bench MFU accounting — XLA cost analysis cannot see
# inside Pallas kernels; same executed-FLOPs convention as
# text_kernel.fused_encoder_layer_flops / gat_train's models)
# --------------------------------------------------------------------

def _mha_fwd_flops(rq, rk, d, heads, per_k, masked):
    from .text_kernel import _mha_flops
    fl = _mha_flops(rq, rk, d, heads)
    if masked:
        # per head: tile matmul + prob multiply
        fl += heads * (2 * per_k * rk + rq * rk)
    return fl


def _ln_pair_flops(r, d):
    """_ln_fwd: mean, E[x²], sub/mul/rsqrt, scale+bias ≈ 8·r·d."""
    return 8.0 * r * d


def encoder_layer_train_fwd_flops(l, tb, d=512, f=2048, heads=8,
                                  masked=True):
    r = tb * l
    fl = 3.0 * r * r                               # block mask
    fl += _mha_fwd_flops(r, r, d, heads, l, masked)
    fl += r * d + _ln_pair_flops(r, d)             # (+m1) residual + LN1
    fl += 2 * r * d * f + 2 * r * f                # FFN in + bias + relu
    fl += 2 * r * f * d + r * d                    # FFN out + bias
    fl += r * d + _ln_pair_flops(r, d)
    if masked:
        fl += r * d + r * f + r * d                # 3 keep-mask muls
    return fl


def _mha_bwd_flops(rq, rk, d, heads, per_k, masked):
    """_mha_bwd reverse chain (recompute is counted via the fwd model)."""
    fl = 2 * rq * d * d + rq * d                   # docat, dWo, dbo
    fl += 2 * d * rq * d
    per_head = 0.0
    dh = d // heads
    per_head += 2 * rq * rk * dh                   # d_pd
    per_head += 2 * rk * rq * dh                   # dv
    per_head += 4 * rq * rk                        # dropout mul + softmax bwd
    per_head += 2 * rq * rk * dh                   # dq
    per_head += 2 * rk * rq * dh                   # dk
    if masked:
        per_head += rq * rk
    fl += heads * per_head
    fl += 3 * (2 * rq * d * d + rq * d)            # dWq/dWk/dWv + biases
    fl += 3 * (2 * rq * d * d)                     # dq_in, dkv_in
    return fl


def encoder_layer_train_bwd_flops(l, tb, d=512, f=2048, heads=8,
                                  masked=True):
    r = tb * l
    # in-VMEM recompute (executed FLOPs)
    fl = encoder_layer_train_fwd_flops(l, tb, d, f, heads, masked)
    # reverse chain
    fl += 2 * (10.0 * r * d)                       # two LN backwards
    fl += 2 * r * f * d + r * f                    # dw2 + db2
    fl += 2 * r * d * f                            # dfa
    fl += 2 * r * f                                # relu mask + mf
    fl += 2 * r * d * f + r * d                    # dw1 + db1
    fl += 2 * r * f * d + r * d                    # dh1
    fl += _mha_bwd_flops(r, r, d, heads, l, masked)
    fl += 2 * r * d                                # dx adds
    if masked:
        fl += 2 * r * d
    return fl


def decoder_layer_train_fwd_flops(l, t, tb, d=512, f=2048, heads=8,
                                  masked=True):
    rt, rm = tb * t, tb * l
    fl = 3.0 * rt * rt + 3.0 * rt * rm
    fl += _mha_fwd_flops(rt, rt, d, heads, t, masked)
    fl += rt * d + _ln_pair_flops(rt, d)
    fl += _mha_fwd_flops(rt, rm, d, heads, l, masked)
    fl += rt * d + _ln_pair_flops(rt, d)
    fl += 2 * rt * d * f + 2 * rt * f
    fl += 2 * rt * f * d + rt * d
    fl += rt * d + _ln_pair_flops(rt, d)
    if masked:
        fl += 3 * rt * d + rt * f
    return fl


def decoder_layer_train_bwd_flops(l, t, tb, d=512, f=2048, heads=8,
                                  masked=True):
    rt, rm = tb * t, tb * l
    fl = decoder_layer_train_fwd_flops(l, t, tb, d, f, heads, masked)
    fl += 3 * (10.0 * rt * d)                      # three LN backwards
    fl += 2 * rt * f * d + rt * f + 2 * rt * d * f + 2 * rt * f
    fl += 2 * rt * d * f + rt * d + 2 * rt * f * d + rt * d
    fl += _mha_bwd_flops(rt, rm, d, heads, l, masked)   # cross
    fl += _mha_bwd_flops(rt, rt, d, heads, t, masked)   # self
    fl += 4 * rt * d
    return fl


def text_stack_train_flops_per_batch(b, l, *, t=4, d=512, f=2048,
                                     heads=8, enc_layers=4, dec_layers=3,
                                     bf16=True, dropout=True):
    """Executed FLOPs of the fused question stack's training step
    (forward + recompute-structured backward) for a batch of ``b``
    questions of ``l`` tokens.  Mirrors the dispatch logic of
    :func:`fused_encoder_layer_train` (row budget, batch padding)."""
    ship = jnp.bfloat16 if bf16 else jnp.float32
    tb = max(_row_budget(ship) // l, 1)
    progs = -(-b // tb)
    fl = progs * enc_layers * (
        encoder_layer_train_fwd_flops(l, tb, d, f, heads, dropout)
        + encoder_layer_train_bwd_flops(l, tb, d, f, heads, dropout))
    if bf16:                                       # decoder fuses bf16-only
        fl += progs * dec_layers * (
            decoder_layer_train_fwd_flops(l, t, tb, d, f, heads, dropout)
            + decoder_layer_train_bwd_flops(l, t, tb, d, f, heads, dropout))
    return fl
