"""Fused post-LN transformer layers (question stack) as Pallas kernels.

One grid program processes ``TB`` whole questions in VMEM: QKV
projections, multi-head attention with the reference's *additive float
key-padding mask* (torch treats a float ``src_key_padding_mask`` as an
attention bias — ``question_encoder.py:35-37``), the output projection,
both residual LayerNorms and the ReLU FFN — i.e. a full
``torch.nn.TransformerEncoderLayer`` / ``TransformerDecoderLayer``
equivalent per call (reference ``question_encoder.py:22-25``,
``question_decoder.py:27-29``).

Why: profiled at the (16, 16) bucket the XLA question stack costs
~12-15 ms of a 41.6 ms batch while its matmuls take ~2 ms — it is
bound by LayerNorm reductions (19 convert+reduce fusions/batch),
attention-layout copies (92 copies/batch) and per-op dispatch, not by
FLOPs.  Fused, a layer reads the activations once and everything else
lives in VMEM.

Batching strategy mirrors the graph kernels' packing: questions are
short (L = 16/32 tokens), so ``TB = rows/L`` questions share one grid
program and attention uses a block-diagonal score mask (same-question
iota compare) so questions never attend across the pack.  The row
budget fills the MXU's 128+ rows per matmul.

Numerics: activations and weights ship at the model dtype (flax
``Dense(dtype=bf16)`` rounds operands before the matmul — same
semantics as the op-by-op path); every accumulation is f32 via
``preferred_element_type``; LayerNorm runs flax's exact fast-variance
f32 formula (eps 1e-6).  Softmax weights round to the model dtype
before the value matmul, matching ``layers._attention``.

Training keeps the XLA composition (dropout is live there); these
kernels serve the eval/inference path, gated like the graph kernels
(``models/mgat.py:157-167``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e30
_LN_EPS = 1e-6          # flax nn.LayerNorm default (layers.py uses it)

# tests force the fused path on CPU in interpret mode (same pattern as
# gat_train.FORCE_INTERPRET)
FORCE_INTERPRET = False


def _ln(x, s_ref, b_ref):
    """flax LayerNorm fast-variance f32 math (normalization.py)."""
    f32 = jnp.float32
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mean * mean,
                      0.0)
    return ((x - mean) * jax.lax.rsqrt(var + _LN_EPS)
            * s_ref[:].astype(f32) + b_ref[:].astype(f32))


def _mha(q_in, kv_in, colbias, blockmask, wq, bq, wk, bk, wv, bv, wo, bo,
         num_heads: int):
    """Multi-head attention over packed rows.

    ``q_in [Rq, D]``, ``kv_in [Rk, D]`` (f32); ``colbias [Rk] | None``
    added to every key logit (the reference's float-mask quirk);
    ``blockmask [Rq, Rk]`` 0/-inf keeps attention within each packed
    question.  Matmul operands round to the weight dtype (Dense
    parity); accumulation f32.
    """
    f32 = jnp.float32
    wdt = wq.dtype
    d = wq.shape[1]
    dh = d // num_heads
    scale = 1.0 / math.sqrt(dh)

    def proj(x, w, b):
        return (jnp.dot(x.astype(wdt), w[:], preferred_element_type=f32)
                + b[:].astype(f32))

    q = proj(q_in, wq, bq)
    k = proj(kv_in, wk, bk)
    v = proj(kv_in, wv, bv)

    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jnp.dot(qh.astype(wdt), kh.astype(wdt).T,
                     preferred_element_type=f32) * scale     # [Rq, Rk]
        if colbias is not None:
            sc = sc + colbias[None, :]
        sc = sc + blockmask
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        # softmax weights round to the model dtype before @ v
        # (layers._attention: w.astype(dtype))
        outs.append(jnp.dot(p.astype(wdt), vh.astype(wdt),
                            preferred_element_type=f32))     # [Rq, dh]
    out = jnp.concatenate(outs, axis=1)                      # [Rq, D]
    return (jnp.dot(out.astype(wdt), wo[:], preferred_element_type=f32)
            + bo[:].astype(f32))


def _ffn(x, w1, b1, w2, b2):
    f32 = jnp.float32
    wdt = w1.dtype
    y = (jnp.dot(x.astype(wdt), w1[:], preferred_element_type=f32)
         + b1[:].astype(f32))
    y = jnp.maximum(y, 0.0)                                  # ReLU FFN
    return (jnp.dot(y.astype(wdt), w2[:], preferred_element_type=f32)
            + b2[:].astype(f32))


def _block_mask(rows_q: int, per_q: int, rows_k: int, per_k: int):
    """[Rq, Rk] 0 where row and col belong to the same packed element,
    −inf elsewhere."""
    gq = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 0) // per_q
    gk = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 1) // per_k
    return jnp.where(gq == gk, 0.0, _NEG).astype(jnp.float32)


def _enc_kernel(
    x_ref,        # [R, D]  R = TB * L rows (TB questions packed)
    kb_ref,       # [R, 1]  float key bias per token (attn_mask values)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    n1s_ref, n1b_ref,         # [1, D] LN1 scale/bias
    w1_ref, b1_ref, w2_ref, b2_ref,   # FFN
    n2s_ref, n2b_ref,         # LN2
    fs_ref, fb_ref,           # final encoder LayerNorm (optional)
    out_ref,      # [R, D]
    *,
    tokens: int,              # L (tokens per question)
    num_heads: int,
    apply_final: bool,
):
    f32 = jnp.float32
    r = x_ref.shape[0]
    x = x_ref[:].astype(f32)
    mask = _block_mask(r, tokens, r, tokens)
    colbias = kb_ref[:].astype(f32)[:, 0]

    attn = _mha(x, x, colbias, mask, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, num_heads)
    x = _ln(x + attn, n1s_ref, n1b_ref)
    y = _ffn(x, w1_ref, b1_ref, w2_ref, b2_ref)
    x = _ln(x + y, n2s_ref, n2b_ref)
    if apply_final:
        x = _ln(x, fs_ref, fb_ref)
    out_ref[:] = x.astype(out_ref.dtype)


def _dec_kernel(
    tgt_ref,      # [Rt, D]  Rt = TB * T query rows
    mem_ref,      # [Rm, D]  Rm = TB * L memory rows
    swq_ref, sbq_ref, swk_ref, sbk_ref, swv_ref, sbv_ref, swo_ref, sbo_ref,
    n1s_ref, n1b_ref,
    cwq_ref, cbq_ref, cwk_ref, cbk_ref, cwv_ref, cbv_ref, cwo_ref, cbo_ref,
    n2s_ref, n2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    n3s_ref, n3b_ref,
    fs_ref, fb_ref,
    out_ref,      # [Rt, D]
    *,
    queries: int,             # T (queries per element)
    tokens: int,              # L (memory tokens per element)
    num_heads: int,
    apply_final: bool,
):
    f32 = jnp.float32
    rt = tgt_ref.shape[0]
    rm = mem_ref.shape[0]
    tgt = tgt_ref[:].astype(f32)
    mem = mem_ref[:].astype(f32)

    # self-attention over each element's T queries (no mask/bias —
    # queries are always real)
    sa = _mha(tgt, tgt, None, _block_mask(rt, queries, rt, queries),
              swq_ref, sbq_ref, swk_ref, sbk_ref, swv_ref, sbv_ref,
              swo_ref, sbo_ref, num_heads)
    tgt = _ln(tgt + sa, n1s_ref, n1b_ref)
    # cross-attention to the question memory; the reference passes no
    # memory padding mask (question_decoder.py:65-67) so padded tokens
    # are attended — only the cross-question block mask applies
    ca = _mha(tgt, mem, None, _block_mask(rt, queries, rm, tokens),
              cwq_ref, cbq_ref, cwk_ref, cbk_ref, cwv_ref, cbv_ref,
              cwo_ref, cbo_ref, num_heads)
    tgt = _ln(tgt + ca, n2s_ref, n2b_ref)
    y = _ffn(tgt, w1_ref, b1_ref, w2_ref, b2_ref)
    tgt = _ln(tgt + y, n3s_ref, n3b_ref)
    if apply_final:
        tgt = _ln(tgt, fs_ref, fb_ref)
    out_ref[:] = tgt.astype(out_ref.dtype)


def _row_budget(ship) -> int:
    # bf16 weights leave VMEM headroom for 256 activation rows; f32
    # weights (12 MB for the encoder) tighten the budget
    return 256 if ship == jnp.bfloat16 else 128


def _pad_batch(b: int, tb: int, *arrays):
    pad = (-b) % tb
    if not pad:
        return b, arrays
    out = []
    for a in arrays:
        out.append(jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0))
    return b + pad, tuple(out)


_ENC_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
              "n1s", "n1b", "w1", "b1", "w2", "b2", "n2s", "n2b")
_DEC_ORDER = ("swq", "sbq", "swk", "sbk", "swv", "sbv", "swo", "sbo",
              "n1s", "n1b",
              "cwq", "cbq", "cwk", "cbk", "cwv", "cbv", "cwo", "cbo",
              "n2s", "n2b", "w1", "b1", "w2", "b2", "n3s", "n3b")


def _ship_params(params, order, final_ln, ship, d):
    """-> (ordered arrays, blockspecs).  Weight matrices ship at the
    model dtype (Dense rounding parity); biases/LN vectors stay f32 and
    arrive as [1, width] rows."""
    f32 = jnp.float32
    arrs, specs = [], []

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    for name in order:
        a = params[name]
        if a.ndim == 2:
            arrs.append(a.astype(ship))
            specs.append(bcast(a.shape))
        else:
            arrs.append(a[None].astype(f32))
            specs.append(bcast((1, a.shape[0])))
    if final_ln is not None:
        fs, fb = final_ln
    else:
        fs = jnp.ones((d,), f32)
        fb = jnp.zeros((d,), f32)
    arrs += [fs[None].astype(f32), fb[None].astype(f32)]
    specs += [bcast((1, d)), bcast((1, d))]
    return arrs, specs


def fused_encoder_layer(x, key_mask, params, *, num_heads: int = 8,
                        final_ln=None, interpret: bool = False):
    """One post-LN transformer encoder layer, fused.

    ``x [B, L, D]``, ``key_mask [B, L]`` (the CLIP attention mask whose
    float value is *added* to key logits — reference quirk).  ``params``
    keys: wq/bq/wk/bk/wv/bv/wo/bo, n1s/n1b, w1/b1/w2/b2, n2s/n2b.
    ``final_ln=(scale, bias)`` folds the encoder's final LayerNorm into
    the last layer's kernel call.  Returns ``[B, L, D]`` at ``x.dtype``.
    """
    b, l, d = x.shape
    f32 = jnp.float32
    ship = jnp.bfloat16 if x.dtype == jnp.bfloat16 else f32
    tb = max(_row_budget(ship) // l, 1)
    bp, (x, key_mask) = _pad_batch(b, tb, x, key_mask)
    g = bp // tb
    r = tb * l

    xr = x.reshape(g, r, d).astype(ship)
    kb = key_mask.astype(f32).reshape(g, r, 1)

    warrs, wspecs = _ship_params(params, _ENC_ORDER, final_ln, ship, d)

    def in2(shape):
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_enc_kernel, tokens=l, num_heads=num_heads,
                               apply_final=final_ln is not None)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[in2((r, d)), in2((r, 1))] + wspecs,
        out_specs=pl.BlockSpec((None, r, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, r, d), ship),
        interpret=interpret,
    )(xr, kb, *warrs)
    return out.reshape(bp, l, d)[:b].astype(x.dtype)


def _mha_flops(rq: int, rk: int, d: int, heads: int) -> float:
    """Executed FLOPs of :func:`_mha` (matmul-exact 2·m·k·n, plus the
    VPU elementwise work at 1 FLOP/op)."""
    fl = 0.0
    fl += 2 * rq * d * d + rq * d            # q projection
    fl += 2 * (2 * rk * d * d + rk * d)      # k, v projections
    fl += 2 * rq * rk * d                    # scores (all heads)
    fl += rq * rk                            # × scale
    fl += 2 * rq * rk                        # + colbias + blockmask
    fl += 4 * rq * rk * heads                # max, sub+exp, sum, div
    fl += 2 * rq * rk * d                    # p @ v (all heads)
    fl += 2 * rq * d * d + rq * d            # output projection
    return fl


def _ln_flops(r: int, d: int) -> float:
    """:func:`_ln`: two mean reduces, sub, rsqrt-mul-scale, bias."""
    return 6.0 * r * d


def fused_encoder_layer_flops(l: int, tb: int, d: int = 512,
                              f: int = 2048, heads: int = 8,
                              final_ln: bool = False) -> float:
    """Executed FLOPs of one encoder-layer grid program
    (:func:`_enc_kernel`; ``R = tb·l`` packed rows).  The packed
    attention computes the full block-diagonal [R, R] score matrix, so
    executed attention work scales with ``tb`` — counting it (rather
    than the useful per-question flops) keeps MFU honest about what
    the MXU actually does, matching the graph kernels' convention
    (``gat_kernel.fused_gat_layer_flops``)."""
    r = tb * l
    fl = 3.0 * r * r                          # block mask (iota ÷, cmp)
    fl += _mha_flops(r, r, d, heads)
    fl += r * d + _ln_flops(r, d)             # residual + LN1
    fl += 2 * r * d * f + r * f + r * f       # FFN in + bias + relu
    fl += 2 * r * f * d + r * d               # FFN out + bias
    fl += r * d + _ln_flops(r, d)             # residual + LN2
    if final_ln:
        fl += _ln_flops(r, d)
    return fl


def fused_decoder_layer_flops(l: int, t: int, tb: int, d: int = 512,
                              f: int = 2048, heads: int = 8,
                              final_ln: bool = False) -> float:
    """Executed FLOPs of one decoder-layer grid program
    (:func:`_dec_kernel`; ``Rt = tb·t`` query rows, ``Rm = tb·l``
    memory rows)."""
    rt, rm = tb * t, tb * l
    fl = 3.0 * rt * rt + 3.0 * rt * rm        # two block masks
    fl += _mha_flops(rt, rt, d, heads)        # self-attention
    fl += rt * d + _ln_flops(rt, d)
    fl += _mha_flops(rt, rm, d, heads)        # cross-attention
    fl += rt * d + _ln_flops(rt, d)
    fl += 2 * rt * d * f + 2 * rt * f         # FFN in + bias + relu
    fl += 2 * rt * f * d + rt * d             # FFN out + bias
    fl += rt * d + _ln_flops(rt, d)
    if final_ln:
        fl += _ln_flops(rt, d)
    return fl


def text_stack_flops_per_batch(b: int, l: int, *, t: int = 4,
                               d: int = 512, f: int = 2048,
                               heads: int = 8, enc_layers: int = 4,
                               dec_layers: int = 3,
                               bf16: bool = True) -> float:
    """Executed FLOPs of the full fused question stack for a batch of
    ``b`` questions of ``l`` tokens: ``enc_layers`` encoder programs +
    ``dec_layers`` decoder programs (each over ``ceil(b/TB)`` grid
    steps), with the final LayerNorms folded into the last layers.
    Mirrors the dispatch logic of :func:`fused_encoder_layer` /
    :func:`fused_decoder_layer` (row budget, batch padding)."""
    ship = jnp.bfloat16 if bf16 else jnp.float32
    tb = max(_row_budget(ship) // l, 1)
    progs = -(-b // tb)                       # ceil over padded batch
    fl = progs * sum(
        fused_encoder_layer_flops(l, tb, d, f, heads,
                                  final_ln=(i == enc_layers - 1))
        for i in range(enc_layers))
    if bf16:                                  # decoder fuses bf16-only
        fl += progs * sum(
            fused_decoder_layer_flops(l, t, tb, d, f, heads,
                                      final_ln=(i == dec_layers - 1))
            for i in range(dec_layers))
    return fl


def fused_decoder_layer(tgt, memory, params, *, num_heads: int = 8,
                        final_ln=None, interpret: bool = False):
    """One post-LN transformer decoder layer (self-attn + cross-attn +
    FFN), fused.  ``tgt [B, T, D]`` learned-query rows, ``memory
    [B, L, D]`` encoded question.  ``params`` keys: s*/c* attention
    projections, n1/n2/n3 LayerNorms, w1/b1/w2/b2 FFN (see
    ``_DEC_ORDER``).  Returns ``[B, T, D]``."""
    b, t, d = tgt.shape
    l = memory.shape[1]
    f32 = jnp.float32
    ship = jnp.bfloat16 if memory.dtype == jnp.bfloat16 else f32
    tb = max(_row_budget(ship) // l, 1)
    bp, (tgt, memory) = _pad_batch(b, tb, tgt, memory)
    g = bp // tb
    rt, rm = tb * t, tb * l

    tr = tgt.reshape(g, rt, d).astype(ship)
    mr = memory.reshape(g, rm, d).astype(ship)

    warrs, wspecs = _ship_params(params, _DEC_ORDER, final_ln, ship, d)

    def in2(shape):
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_dec_kernel, queries=t, tokens=l,
                               num_heads=num_heads,
                               apply_final=final_ln is not None)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[in2((rt, d)), in2((rm, d))] + wspecs,
        out_specs=pl.BlockSpec((None, rt, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rt, d), ship),
        interpret=interpret,
    )(tr, mr, *warrs)
    return out.reshape(bp, t, d)[:b].astype(tgt.dtype)
