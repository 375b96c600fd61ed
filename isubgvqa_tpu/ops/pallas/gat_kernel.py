"""Fused masked-GATv2 layer as a single Pallas TPU kernel.

One grid program processes one graph entirely in VMEM: the GATv2
message/attention/aggregation (reference ``mgat_v2_conv.py:243-279``),
the head-projection MLP (``mgat.py:79-89,156``), the
instruction-conditioned per-graph SDP reweighting
(``utils/scatter_scaled_dot_product.py:6-15``), GraphNorm
(``mgat.py:93-95,171``) and the residual (``mgat.py:172``) — i.e. the
whole body of one MGAT layer after instruction fusion and mask
sampling.

Why: the layer decomposes into ~60 XLA ops over small per-graph
tensors; per-op dispatch overhead dominates at GQA shapes.  Fused, the
``[E, H·C]`` message tensor never leaves VMEM and every edge<->node
move is an MXU matmul against an in-register one-hot incidence:

    gather  = onehot_src [E, N] @ x_l [N, H·C]
    scatter = onehot_dstᵀ [N, E] @ (x_src · α) [E, H·C]
    softmax per destination: max/sum through the same incidences.

VMEM budget per program at (N=64, E=192, C=300, H=4, bf16 ship):
x/h 2×40 KB in, edges [E, C] 115 KB in, messages (f32 [E, H·C]
intermediates incl. the in-kernel eproj) ~4×920 KB, one-hots 2×25 KB,
weights (lin_l/lin_r 1.4 MB ×2 f32, x_proj 3.6 MB f32, we 720 KB) —
≈ 11 MB.  The (N=128, E=384) bucket peaks at ~16.1 MB, just over the
compiler's default 16 MB *scoped* VMEM limit (a compiler cap, not the
hardware), so the pallas_call raises ``vmem_limit_bytes``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import gelu_exact

_NEG = -1.0e30


def _kernel(
    # per-program blocks (N = G * nodes-per-graph when G graphs are
    # packed into one program; the incidence one-hots realize the
    # block-diagonal structure for free, and per-graph reductions run
    # through the [N, G] graph one-hot)
    h_ref,        # [N, C]   pre-fusion node features (residual input)
    xf_ref,       # [N, C]   instruction-fused node features
    instr_ref,    # [G, C]   instruction vector per packed graph
    gate_ref,     # [N, 1]   node mask gate (ones when unmasked)
    src_ref,      # [E, 1]   int32 source positions
    dst_ref,      # [E, 1]   int32 destination positions
    emask_ref,    # [E, 1]   edge validity (float)
    nmask_ref,    # [N, 1]   node validity (float)
    e_ref,        # [E, C]   edge features (bf16)
    # broadcast weight blocks
    we_ref,                # [C, HC] lin_edge weight (bf16)
    wl_ref, bl_ref,        # [C, HC], [1, HC]
    wr_ref, br_ref,        # [C, HC], [1, HC]
    attb_ref,              # [HC, H] block-diagonal att vector
    expand_ref,            # [H, HC] head -> channel broadcast matrix
    cbias_ref,             # [1, HC] conv bias
    w1_ref, b1_ref,        # [HC, P], [1, P] x_proj layer 1
    w2_ref, b2_ref,        # [P, C], [1, C]  x_proj layer 2
    gn_w_ref, gn_b_ref, gn_a_ref,   # [1, C] GraphNorm weight/bias/mean-scale
    # outputs
    out_ref,      # [N, C]   layer output (residual applied)
    alpha_ref,    # [E, H]   attention weights
    *,
    negative_slope: float,
    apply_mask_to_h: bool,
    fuse_instr: bool,
    eps: float = 1e-5,
):
    n = h_ref.shape[0]
    e = src_ref.shape[0]
    hc = wl_ref.shape[1]
    nheads = attb_ref.shape[1]
    f32 = jnp.float32

    emask = emask_ref[:]                             # [E, 1]
    nmask = nmask_ref[:]                             # [N, 1]
    gate = gate_ref[:].astype(f32)                   # [N, 1]

    # graph-segment one-hot: node row -> its packed graph
    g_count = instr_ref.shape[0]
    npg = n // g_count
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (n, g_count), 0) // npg
    g_col = jax.lax.broadcasted_iota(jnp.int32, (n, g_count), 1)
    oh_g = (g_iota == g_col).astype(f32)                     # [N, G]
    ins_node = jnp.dot(oh_g, instr_ref[:].astype(f32),
                       preferred_element_type=f32)           # [N, C]

    if fuse_instr:
        # instruction gating in VMEM (mgat_v2_conv.py:152-157): the
        # gelu(h * instr) tensor never round-trips through HBM.  Only
        # used for unmasked layers — the mask head consumes xf on the
        # host-side graph, so masked layers still pass it in.
        xf = gelu_exact(h_ref[:].astype(f32) * ins_node)
    else:
        xf = xf_ref[:]                               # [N, C]

    # node projections (MXU, bf16 operands, f32 accumulation)
    xfb = xf.astype(wl_ref.dtype)
    x_l = (jnp.dot(xfb, wl_ref[:], preferred_element_type=f32)
           + bl_ref[:].astype(f32))
    x_r = (jnp.dot(xfb, wr_ref[:], preferred_element_type=f32)
           + br_ref[:].astype(f32))

    # incidence one-hots from positions (VPU iota compare)
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    oh_src = (src_ref[:] == node_iota).astype(f32) * emask   # [E, N]
    oh_dst = (dst_ref[:] == node_iota).astype(f32) * emask

    # gather x_l[src], x_r[dst] as matmuls.  The [·, HC]-wide
    # incidence matmuls run at the weight dtype (one-hot rows are
    # exact in bf16; accumulation stays f32) — full-rate MXU, and for
    # bf16 models the rounding matches Dense-output rounding in the
    # op-by-op path.
    wdt = wl_ref.dtype
    oh_src_w = oh_src.astype(wdt)
    oh_dst_w = oh_dst.astype(wdt)
    xs = jnp.dot(oh_src_w, x_l.astype(wdt),
                 preferred_element_type=f32)                 # [E, HC]
    xd = jnp.dot(oh_dst_w, x_r.astype(wdt),
                 preferred_element_type=f32)

    # lin_edge IN-KERNEL: computing the [E, HC] edge projection here
    # instead of materializing it for all 4 layers saves >1 GB of HBM
    # round-trips per bench batch.  Rounding through the shipped dtype
    # matches the model's Dense exactly: bf16 models round like
    # Dense(dtype=bf16); f32 models keep full precision (the
    # differentiable XLA path computes the same projection upstream).
    eproj = jnp.dot(e_ref[:], we_ref[:],
                    preferred_element_type=f32)
    eproj = eproj.astype(e_ref.dtype).astype(f32)            # [E, HC]
    m = xs + xd + eproj

    # edge gate = gate[src]*gate[dst] (mgat_v2_conv.py:169-171)
    egate = (jnp.dot(oh_src, gate.astype(f32),
                     preferred_element_type=f32)
             * jnp.dot(oh_dst, gate.astype(f32),
                       preferred_element_type=f32))          # [E, 1]
    m = m * egate                                            # :263-264
    m = jnp.where(m >= 0, m, m * negative_slope)             # leaky_relu
    m = m * egate                                            # :268-269

    # attention logits per head: [E, HC] @ [HC, H]
    logits = jnp.dot(m, attb_ref[:].astype(f32),
                     preferred_element_type=f32)             # [E, H]
    logits = jnp.where(emask > 0, logits, _NEG)

    # per-destination softmax via the incidence matrices.
    # max over incoming edges per node, head-unrolled to keep every
    # intermediate 2-D (Mosaic-friendly tiling)
    inc = oh_dst > 0                                         # [E, N]
    max_cols = []
    for hh in range(nheads):
        lh = logits[:, hh][:, None]                          # [E, 1]
        mh = jnp.max(jnp.where(inc, lh, _NEG), axis=0)       # [N]
        max_cols.append(mh[:, None])
    max_n = jnp.concatenate(max_cols, axis=1)                # [N, H]
    max_e = jnp.dot(oh_dst, max_n, preferred_element_type=f32)  # [E, H]
    expv = jnp.exp(logits - jnp.maximum(max_e, _NEG)) * emask
    denom_n = jnp.dot(oh_dst.T, expv, preferred_element_type=f32)  # [N, H]
    denom_e = jnp.dot(oh_dst, denom_n, preferred_element_type=f32)
    # guard: masked edges have denom 0; a tiny floor would make the
    # division's backward (-expv/denom^2) subnormal-flush to 0/0=NaN
    denom_safe = jnp.where(denom_e > 1e-12, denom_e, 1.0)
    alpha = expv / denom_safe                                # [E, H]
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)

    # weight = alpha * edge gate, broadcast per head to channels
    # (mgat_v2_conv.py:277-279: x_j * (alpha * edge_mask))
    w_edge = alpha * egate
    w_bcast = jnp.dot(w_edge, expand_ref[:].astype(f32),
                      preferred_element_type=f32)            # [E, HC]
    weighted = xs * w_bcast
    conv = jnp.dot(oh_dst_w.T, weighted.astype(wdt),
                   preferred_element_type=f32)               # [N, HC]
    conv = conv + cbias_ref[:].astype(f32)

    # x_proj MLP 1200 -> 600 -> 300 with GELUs (mgat.py:79-89)
    p = jnp.dot(conv.astype(w1_ref.dtype), w1_ref[:],
                preferred_element_type=f32) + b1_ref[:].astype(f32)
    p = gelu_exact(p)
    p = jnp.dot(p.astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=f32) + b2_ref[:].astype(f32)
    p = gelu_exact(p)                                       # [N, C]

    # instruction-conditioned SDP reweighting over each graph's nodes
    sdp_logits = jnp.sum(p * ins_node, axis=1, keepdims=True)  # [N, 1]
    sdp_logits = sdp_logits / math.sqrt(p.shape[-1])
    sdp_logits = jnp.where(nmask > 0, sdp_logits, _NEG)
    lg = jnp.where(oh_g > 0, sdp_logits, _NEG)               # [N, G]
    gmax = jnp.max(lg, axis=0, keepdims=True)                # [1, G]
    mx = jnp.sum(oh_g * gmax, axis=1, keepdims=True)         # [N, 1]
    sdp_exp = jnp.exp(sdp_logits - mx) * nmask
    dsum = jnp.dot(oh_g.T, sdp_exp, preferred_element_type=f32)  # [G, 1]
    den = jnp.dot(oh_g, dsum, preferred_element_type=f32)    # [N, 1]
    sdp = sdp_exp / jnp.where(den > 1e-12, den, 1.0)
    p = p * sdp                                              # [N, C]

    # GraphNorm over each packed graph's valid nodes
    count = jnp.maximum(jnp.dot(oh_g.T, nmask,
                                preferred_element_type=f32), 1.0)  # [G, 1]
    mean_g = jnp.dot(oh_g.T, p * nmask,
                     preferred_element_type=f32) / count     # [G, C]
    mean = jnp.dot(oh_g, mean_g, preferred_element_type=f32)  # [N, C]
    shifted = p - gn_a_ref[:].astype(f32) * mean
    var_g = jnp.dot(oh_g.T, shifted * shifted * nmask,
                    preferred_element_type=f32) / count
    var = jnp.dot(oh_g, var_g, preferred_element_type=f32)
    normed = shifted * jax.lax.rsqrt(var + eps)
    normed = normed * nmask
    p = normed * gn_w_ref[:].astype(f32) + gn_b_ref[:].astype(f32)

    # residual (mgat.py:172), then optional interpretable mask multiply
    out = p + h_ref[:].astype(f32)
    if apply_mask_to_h:
        out = out * gate.astype(f32)
    out_ref[:] = out.astype(out_ref.dtype)


def fused_gat_layer(
    h: jax.Array,            # [B, N, C] pre-fusion features
    xf: jax.Array,           # [B, N, C] fused features gelu(h*instr)
    instr: jax.Array,        # [B, C]
    gate: jax.Array,         # [B, N, 1] node gate (ones if unmasked)
    src: jax.Array,          # [B, E] int32
    dst: jax.Array,          # [B, E] int32
    edge_mask: jax.Array,    # [B, E] bool
    node_mask: jax.Array,    # [B, N] bool
    e_attr: jax.Array,       # [B, E, C] edge features (pre lin_edge)
    params: dict,            # weight dict, see below
    negative_slope: float = 0.2,
    apply_mask_to_h: bool = False,
    interpret: bool = False,
    pack: int | None = None,
    fuse_instr: bool = False,
):
    """Run the fused layer; returns ``(out [B,N,C], alpha [B,E,H])``.

    ``params`` keys: wl, bl, wr, br, attb, expand, cbias, w1, b1, w2,
    b2, gn_w, gn_b, gn_a, plus ``we`` — this layer's lin_edge weight
    ``[C, HC]``.  The edge projection is computed *inside* the kernel
    from ``e_attr`` (bf16, Dense parity), so the ``[B, E, H·C]``
    intermediate never exists in HBM.

    ``fuse_instr``: compute the instruction gating ``gelu(h · instr)``
    inside the kernel instead of reading a precomputed ``xf`` block
    (``xf`` is then ignored; pass ``h``).  Used for unmasked layers —
    the sampler head needs ``xf`` host-side on masked layers.

    ``pack``: number of graphs fused into one grid program — an int,
    ``"auto"`` for the per-shape heuristic (the config default), or
    ``None``/1 for unpacked.  Packing multiplies the MXU contraction
    dim (K = packed node count) and divides the program count by G;
    the incidence one-hots realize the block-diagonal edge structure
    with no math change, and SDP / GraphNorm reduce through a [N, G]
    graph one-hot.  On small buckets the layer is per-program-overhead
    bound, so packing is the dominant lever: measured −24% device time
    for the whole forward on the (16, 16) bucket (54.8 → 41.6
    ms/batch at batch 2048, pack 6).  Exactness pinned by
    ``tests/test_gat_kernel.py::test_graph_packing_is_exact``.
    """
    b, n, c = h.shape
    e = src.shape[1]
    hc = params["wl"].shape[1]
    nheads = params["attb"].shape[1]
    p_dim = params["w1"].shape[1]
    dtype = h.dtype

    if pack == "auto":
        # lift per-program matmul dims toward the MXU's 128 rows; the
        # same heuristic as the train path (gat_train.py:_pick_pack)
        # but with the eval kernel's 384-edge VMEM budget
        pack = max(min(128 // max(n, 1), 384 // max(e, 1), 8), 1)
    elif pack is None:
        pack = 1
    pack = min(pack, max(128 // n, 1), max(384 // e, 1))
    if pack > 1:
        pad = (-b) % pack
        if pad:
            def padb(x):
                return jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            h, xf, instr, gate, src, dst, e_attr = map(
                padb, (h, xf, instr, gate, src, dst, e_attr))
            edge_mask = padb(edge_mask)
            node_mask = padb(node_mask)
        bp = (b + pad) // pack
        offs = (jnp.arange(pack, dtype=jnp.int32) * n)[None, :, None]
        src_p = (src.reshape(bp, pack, e).astype(jnp.int32)
                 + offs).reshape(bp, pack * e)
        dst_p = (dst.reshape(bp, pack, e).astype(jnp.int32)
                 + offs).reshape(bp, pack * e)
        out, alpha = _fused_gat_call(
            h.reshape(bp, pack * n, c),
            xf.reshape(bp, pack * n, xf.shape[-1]),
            instr.reshape(bp, pack, c), gate.reshape(bp, pack * n, 1),
            src_p, dst_p, edge_mask.reshape(bp, pack * e),
            node_mask.reshape(bp, pack * n),
            e_attr.reshape(bp, pack * e, c), params, negative_slope,
            apply_mask_to_h, interpret, n_graphs=pack,
            fuse_instr=fuse_instr)
        out = out.reshape(bp * pack, n, c)[:b]
        alpha = alpha.reshape(bp * pack, e, nheads)[:b]
        return out.astype(dtype), alpha
    return _fused_gat_call(h, xf, instr[:, None, :], gate, src, dst,
                           edge_mask, node_mask, e_attr, params,
                           negative_slope, apply_mask_to_h, interpret,
                           n_graphs=1, fuse_instr=fuse_instr)


def _fused_gat_call(h, xf, instr, gate, src, dst, edge_mask, node_mask,
                    e_attr, params, negative_slope, apply_mask_to_h,
                    interpret, n_graphs: int, fuse_instr: bool = False):
    """pallas_call plumbing; ``instr`` arrives ``[B, G, C]``."""
    b, n, c = h.shape
    e = src.shape[1]
    hc = params["wl"].shape[1]
    nheads = params["attb"].shape[1]
    p_dim = params["w1"].shape[1]
    dtype = h.dtype
    g = n_graphs
    # xf is wider than h under concat_instr ([.., 2C]); edges keep
    # their own width — block shapes follow each tensor
    cxf = h.shape[2] if fuse_instr else xf.shape[2]
    ce = e_attr.shape[2]

    # Mosaic (this toolchain) rejects some bf16 lane broadcasts, so all
    # elementwise work runs f32 *inside* the kernel — but the big
    # per-graph blocks (h/xf/out and the edge features) travel
    # HBM<->VMEM at the model's native dtype (bf16 halves the DMA) and
    # upcast on load.  The lin_edge weight ships bf16 (Dense parity);
    # remaining weights stay f32 for accuracy, fitting the 16 MB VMEM
    # budget at N=128/E=384.
    f32 = jnp.float32
    ship = jnp.bfloat16 if dtype == jnp.bfloat16 else f32
    if fuse_instr:
        # xf is computed in-kernel; ship a zero-width placeholder so
        # the pipeline never DMAs a real block for it
        xf = jnp.zeros((b, 1, c), dtype)
    h, xf, instr, gate = (t.astype(ship) for t in (h, xf, instr, gate))
    e_attr = e_attr.astype(ship)
    # The big weight matrices ship at the model's dtype: flax
    # ``Dense(dtype=bf16)`` (the op-by-op reference path) rounds its
    # kernel to bf16 before the matmul, so bf16 shipping *matches* the
    # reference semantics, halves weight VMEM, and runs the MXU at the
    # full bf16 rate.  Measured perf-neutral on the small buckets
    # (there the kernel is per-program-overhead-bound — packing is the
    # lever, see ``fused_gat_layer``); kept for the semantics + VMEM
    # headroom.  Biases and the small per-channel vectors stay f32
    # (VPU adds, no rate benefit, and f32 accumulation keeps them
    # exact).
    we = params["we"].astype(ship)
    big = ("wl", "wr", "w1", "w2")
    shipped = {k: params[k].astype(ship) for k in big}
    params = {**{k: v.astype(f32) for k, v in params.items()
                 if k != "we" and k not in big}, **shipped}

    kernel = functools.partial(_kernel, negative_slope=negative_slope,
                               apply_mask_to_h=apply_mask_to_h,
                               fuse_instr=fuse_instr)

    # per-graph inputs carry a leading block dim of 1; reshape inside
    # is implicit because BlockSpec slices to [1, ...] — Pallas refs
    # drop unit leading dims only if the block shape omits them, so we
    # instead fold the batch into the grid and pass 2-D blocks.
    grid = (b,)

    def in2(shape):
        # [B, a, b] -> per-program [a, b]
        return pl.BlockSpec((None,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((b, n, c), ship),
        jax.ShapeDtypeStruct((b, e, nheads), jnp.float32),
    )

    # the (N=128, E=384) bucket's working set peaks ~16.1 MB — just
    # over the compiler's default 16 MB *scoped* VMEM limit (physical
    # VMEM is larger); raise the cap so the big bucket compiles
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)

    out, alpha = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=None if interpret else compiler_params,
        in_specs=[
            in2((n, c)),          # h
            in2((1, cxf) if fuse_instr else (n, cxf)),  # xf (or placeholder)
            in2((g, c)),          # instr (one row per packed graph)
            in2((n, 1)),          # gate
            in2((e, 1)),          # src
            in2((e, 1)),          # dst
            in2((e, 1)),          # emask
            in2((n, 1)),          # nmask
            in2((e, ce)),         # e_attr
            bcast((ce, hc)),                    # we (lin_edge)
            bcast((cxf, hc)), bcast((1, hc)),   # wl, bl
            bcast((cxf, hc)), bcast((1, hc)),   # wr, br
            bcast((hc, nheads)),                # attb
            bcast((nheads, hc)),                # expand
            bcast((1, hc)),                     # cbias
            bcast((hc, p_dim)), bcast((1, p_dim)),  # w1, b1
            bcast((p_dim, c)), bcast((1, c)),       # w2, b2
            bcast((1, c)), bcast((1, c)), bcast((1, c)),  # gn w/b/a
        ],
        out_specs=(
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, e, nheads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        h, xf, instr, gate,
        src[..., None].astype(jnp.int32), dst[..., None].astype(jnp.int32),
        edge_mask[..., None].astype(f32), node_mask[..., None].astype(f32),
        e_attr,
        we,
        params["wl"], params["bl"][None, :],
        params["wr"], params["br"][None, :],
        params["attb"], params["expand"], params["cbias"][None, :],
        params["w1"], params["b1"][None, :],
        params["w2"], params["b2"][None, :],
        params["gn_w"][None, :], params["gn_b"][None, :],
        params["gn_a"][None, :],
    )
    return out.astype(dtype), alpha


def fused_gat_layer_flops(n: int, e: int, c: int = 300, heads: int = 4,
                          g: int = 1, fuse_instr: bool = False) -> float:
    """Analytic FLOP count of one fused-GAT-layer kernel program
    (matmul-exact: 2·m·k·n per ``jnp.dot``, plus the elementwise VPU
    work at 1 FLOP/op).  XLA's ``cost_analysis`` cannot see inside
    Pallas kernels, so the benchmark adds this per layer to make the
    reported MFU exact instead of a lower bound (``bench.py``).
    Mirrors :func:`_kernel` op by op."""
    hc = heads * c
    p_dim = hc // 2
    fl = 0.0
    fl += 2 * n * g * c                      # ins_node = oh_g @ instr
    if fuse_instr:
        fl += 12 * n * c                     # gelu(h * instr) (erf ~10)
    fl += 2 * (2 * n * c * hc + n * hc)      # x_l, x_r (+bias)
    fl += 2 * e * n                          # one-hot compares (×2 maps)
    fl += 2 * (2 * e * n * hc)               # xs, xd gathers
    fl += 2 * e * c * hc                     # eproj (lin_edge)
    fl += 2 * e * hc                         # m = xs + xd + eproj
    fl += 2 * (2 * e * n)                    # edge-gate gathers
    fl += 4 * e * hc                         # gate mul ×2, leaky relu ×2
    fl += 2 * e * hc * heads                 # attention logits
    fl += e * n * heads                      # per-head max reduce
    fl += 2 * e * n * heads                  # max_e broadcast
    fl += 3 * e * heads                      # exp + sub + mask
    fl += 2 * (2 * e * n * heads)            # denom_n, denom_e
    fl += 2 * e * heads                      # div + alpha·egate
    fl += 2 * e * heads * hc                 # w_bcast head expand
    fl += e * hc                             # weighted = xs * w_bcast
    fl += 2 * e * n * hc                     # conv scatter
    fl += 2 * n * hc * p_dim + 12 * n * p_dim   # x_proj 1 + gelu
    fl += 2 * n * p_dim * c + 12 * n * c        # x_proj 2 + gelu
    fl += 2 * n * c + 4 * n                  # sdp logits + softmax
    fl += 6 * n * g * c                      # GraphNorm segment reduces
    fl += 8 * n * c                          # norm elementwise + residual
    return fl


def metalayer_kernel_flops(n: int, e: int, c: int = 300) -> float:
    """Analytic FLOPs of one fused-MetaLayer kernel program
    (:mod:`.metalayer_kernel`), matmul-exact."""
    fl = 0.0
    fl += 2 * e * n                          # one-hot compares
    fl += 2 * (2 * e * n * c)                # xs, xd gathers
    fl += 3 * (2 * e * c * c) + 12 * e * c   # edge MLP in + gelu
    fl += 2 * e * c * c                      # edge MLP out
    fl += 2 * (2 * e * c * c) + 12 * e * c   # node mlp1 in + gelu
    fl += 2 * e * c * c                      # node mlp1 out
    fl += 2 * e * n * c + 2 * e * n          # agg scatter + degree
    fl += 2 * (2 * n * c * c) + 12 * n * c   # node mlp2 in + gelu
    fl += 2 * n * c * c                      # node mlp2 out
    fl += 10 * n * c                         # GraphNorm
    return fl


def pack_gat_params(heads: int, out_channels: int, wl, bl, wr, br, att,
                    cbias, w1, b1, w2, b2, gn_w, gn_b, gn_a):
    """Prepack weights: block-diagonal att vector and head-broadcast
    matrices so per-head reductions/broadcasts run on the MXU."""
    hc = heads * out_channels
    attb = np.zeros((hc, heads), np.float32)
    expand = np.zeros((heads, hc), np.float32)
    att = np.asarray(att, np.float32).reshape(heads, out_channels)
    for h in range(heads):
        attb[h * out_channels:(h + 1) * out_channels, h] = att[h]
        expand[h, h * out_channels:(h + 1) * out_channels] = 1.0
    return {
        "wl": wl, "bl": bl, "wr": wr, "br": br,
        "attb": jnp.asarray(attb), "expand": jnp.asarray(expand),
        "cbias": cbias, "w1": w1, "b1": b1, "w2": w2, "b2": b2,
        "gn_w": gn_w, "gn_b": gn_b, "gn_a": gn_a,
    }


def gat_conv_reference(xf, gate, src, dst, edge_mask, eproj, params,
                       negative_slope=0.2, egate=None):
    """Pure-XLA GATv2 conv (message/attention/aggregation) — the
    edge-space half of the layer (``mgat_v2_conv.py:243-279``), op by
    op.  Returns ``(conv [B,N,H·C], alpha [B,E,H])``.

    The node-gate→edge-gate step routes through
    :func:`~isubgvqa_tpu.sampling.node_edge.dense_node_gate_to_edge_gate`,
    whose custom VJP reproduces the reference's dst-only mask backward
    (``sampling/node_edge_masks.py:13-19``; applied at
    ``mgat_v2_conv.py:169-171``) instead of the product rule.

    ``egate`` overrides the computed edge gate (used by gradient
    parity tests to read the cotangent arriving at the edge gate).
    """
    from ...sampling.node_edge import dense_node_gate_to_edge_gate

    f32 = jnp.float32
    b, n, c = xf.shape[0], xf.shape[1], xf.shape[2]

    x_l = jnp.einsum("bnc,ch->bnh", xf.astype(f32),
                     params["wl"].astype(f32)) + params["bl"]
    x_r = jnp.einsum("bnc,ch->bnh", xf.astype(f32),
                     params["wr"].astype(f32)) + params["br"]
    oh_src = jax.nn.one_hot(src, n, dtype=f32) * edge_mask[..., None]
    oh_dst = jax.nn.one_hot(dst, n, dtype=f32) * edge_mask[..., None]
    xs = jnp.einsum("ben,bnh->beh", oh_src, x_l)
    xd = jnp.einsum("ben,bnh->beh", oh_dst, x_r)
    m = xs + xd + eproj.astype(f32)
    if egate is None:
        egate = dense_node_gate_to_edge_gate(gate.astype(f32), oh_src, oh_dst)
    m = m * egate
    m = jnp.where(m >= 0, m, m * negative_slope)
    m = m * egate
    logits = jnp.einsum("beh,hk->bek", m, params["attb"].astype(f32))
    logits = jnp.where(edge_mask[..., None], logits, _NEG)
    inc = oh_dst > 0
    big = jnp.where(inc[..., None], logits[:, :, None, :], _NEG)
    max_n = jnp.max(big, axis=1)
    max_e = jnp.einsum("ben,bnh->beh", oh_dst, max_n)
    expv = jnp.exp(logits - jnp.maximum(max_e, _NEG)) * edge_mask[..., None]
    denom_n = jnp.einsum("ben,beh->bnh", oh_dst, expv)
    denom_e = jnp.einsum("ben,bnh->beh", oh_dst, denom_n)
    denom_safe = jnp.where(denom_e > 1e-12, denom_e, 1.0)
    alpha = expv / denom_safe
    w_edge = alpha * egate
    w_bcast = jnp.einsum("beh,hk->bek", w_edge, params["expand"].astype(f32))
    conv = jnp.einsum("ben,beh->bnh", oh_dst, xs * w_bcast) + params["cbias"]
    return conv, alpha


def gat_head_reference(h, conv, instr, gate, node_mask, params,
                       apply_mask_to_h=False):
    """Node-space half of the layer: x_proj MLP (``mgat.py:79-89``),
    instruction-conditioned per-graph SDP reweighting
    (``utils/scatter_scaled_dot_product.py:6-15``), GraphNorm, residual
    (``mgat.py:168-172``), optional interpretable mask multiply.  Plain
    differentiable XLA — these are dense batched matmuls and per-graph
    reductions that the compiler already schedules well, so the fused
    *training* path reuses this exact function after the Pallas conv
    (:func:`isubgvqa_tpu.ops.pallas.gat_train.fused_gatconv`)."""
    f32 = jnp.float32
    p = jnp.einsum("bnh,hp->bnp", conv.astype(f32),
                   params["w1"].astype(f32)) + params["b1"]
    p = jax.nn.gelu(p, approximate=False)
    p = jnp.einsum("bnp,pc->bnc", p, params["w2"].astype(f32)) + params["b2"]
    p = jax.nn.gelu(p, approximate=False)
    sdp_logits = jnp.einsum("bnc,bc->bn", p, instr.astype(f32))
    sdp_logits = sdp_logits / math.sqrt(p.shape[-1])
    sdp_logits = jnp.where(node_mask, sdp_logits, _NEG)
    sdp_logits = sdp_logits - jnp.max(sdp_logits, axis=1, keepdims=True)
    sdp_exp = jnp.exp(sdp_logits) * node_mask
    sdp_denom = jnp.sum(sdp_exp, axis=1, keepdims=True)
    sdp = sdp_exp / jnp.where(sdp_denom > 1e-12, sdp_denom, 1.0)
    p = p * sdp[..., None]
    nm = node_mask[..., None].astype(f32)
    count = jnp.maximum(jnp.sum(nm, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(p * nm, axis=1, keepdims=True) / count
    shifted = p - params["gn_a"] * mean
    var = jnp.sum(shifted * shifted * nm, axis=1, keepdims=True) / count
    normed = shifted * jax.lax.rsqrt(var + 1e-5) * nm
    p = normed * params["gn_w"] + params["gn_b"]
    out = p + h.astype(f32)
    if apply_mask_to_h:
        out = out * gate.astype(f32)
    return out.astype(h.dtype)


def gat_layer_reference(h, xf, instr, gate, src, dst, edge_mask, node_mask,
                        eproj, params, negative_slope=0.2,
                        apply_mask_to_h=False, egate=None):
    """Pure-XLA reference of the fused kernel (same math, op-by-op) —
    the differentiable fallback/verification path, composed of
    :func:`gat_conv_reference` + :func:`gat_head_reference`.  The
    fused Pallas inference kernel shares the identical forward; the
    fused *training* path (:mod:`.gat_train`) swaps the conv half for
    a custom-VJP Pallas pair and keeps this head."""
    conv, alpha = gat_conv_reference(xf, gate, src, dst, edge_mask, eproj,
                                     params, negative_slope, egate=egate)
    out = gat_head_reference(h, conv, instr, gate, node_mask, params,
                             apply_mask_to_h=apply_mask_to_h)
    return out, alpha
