"""Fused MetaLayer round + GraphNorm as one Pallas kernel per graph.

Fuses the scene-graph encoder's message round
(``scene_graph_encoder.py:107-146``): EdgeModel MLP on
``[x_src, x_dst, e]``, NodeModel mean aggregation + re-embedding, and
the GraphNorm at ``:99-102`` — keeping the ``[E, 900]`` concat and all
messages in VMEM.  Edge<->node moves are one-hot incidence matmuls as
in :mod:`.gat_kernel`.

Outputs both the normalized node features and the EdgeModel output
(the GAT stack consumes the latter as edge features,
``isubgvqa.py:255-270``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import gelu_exact


def _kernel(
    x_ref,        # [N, C]  encoded node features
    e_ref,        # [E, C]  signed edge embeddings
    src_ref,      # [E, 1] int32
    dst_ref,      # [E, 1] int32
    emask_ref,    # [E, 1] float
    nmask_ref,    # [N, 1] float
    ew1_ref, eb1_ref,   # [3C, C], [1, C] edge_mlp.0
    ew2_ref, eb2_ref,   # [C, C],  [1, C] edge_mlp.2
    n1w1_ref, n1b1_ref,  # [2C, C], [1, C] node_mlp_1.0
    n1w2_ref, n1b2_ref,  # [C, C],  [1, C] node_mlp_1.2
    n2w1_ref, n2b1_ref,  # [2C, C], [1, C] node_mlp_2.0
    n2w2_ref, n2b2_ref,  # [C, C],  [1, C] node_mlp_2.2
    gn_w_ref, gn_b_ref, gn_a_ref,   # [1, C]
    x_out_ref,    # [N, C]
    e_out_ref,    # [E, C]
    *,
    eps: float = 1e-5,
    n_graphs: int = 1,
):
    f32 = jnp.float32
    n = x_ref.shape[0]
    e = src_ref.shape[0]

    x = x_ref[:].astype(f32)
    eattr = e_ref[:].astype(f32)
    emask = emask_ref[:]
    nmask = nmask_ref[:]

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    oh_src = (src_ref[:] == node_iota).astype(f32) * emask
    oh_dst = (dst_ref[:] == node_iota).astype(f32) * emask

    xs = jnp.dot(oh_src, x, preferred_element_type=f32)    # [E, C]
    xd = jnp.dot(oh_dst, x, preferred_element_type=f32)

    # EdgeModel: MLP([src, dst, e]) (scene_graph_encoder.py:118-120)
    # concat @ W == xs@W1 + xd@W2 + e@W3 with W split row-wise.
    # MLP weights ship at the model dtype and matmul operands round to
    # it (flax ``Dense(dtype=bf16)`` semantics, = the op-by-op
    # reference path) so the MXU runs at full bf16 rate; accumulation
    # stays f32 via preferred_element_type.  f32 models are unchanged
    # (every cast is a no-op).
    c = x.shape[1]
    wdt = ew1_ref.dtype
    ew1 = ew1_ref[:]
    h = (jnp.dot(xs.astype(wdt), ew1[:c], preferred_element_type=f32)
         + jnp.dot(xd.astype(wdt), ew1[c:2 * c], preferred_element_type=f32)
         + jnp.dot(eattr.astype(wdt), ew1[2 * c:],
                   preferred_element_type=f32)
         + eb1_ref[:].astype(f32))
    h = gelu_exact(h)
    e_out = jnp.dot(h.astype(wdt), ew2_ref[:],
                    preferred_element_type=f32) + eb2_ref[:].astype(f32)
    e_out_ref[:] = e_out.astype(e_out_ref.dtype)

    # NodeModel: mlp1([x_src, e_out]) -> mean_dst -> mlp2([x, agg])
    n1w1 = n1w1_ref[:]
    m = (jnp.dot(xs.astype(wdt), n1w1[:c], preferred_element_type=f32)
         + jnp.dot(e_out.astype(wdt), n1w1[c:], preferred_element_type=f32)
         + n1b1_ref[:].astype(f32))
    m = gelu_exact(m)
    m = jnp.dot(m.astype(wdt), n1w2_ref[:],
                preferred_element_type=f32) + n1b2_ref[:].astype(f32)
    m = m * emask
    agg = jnp.dot(oh_dst.T, m, preferred_element_type=f32)   # [N, C]
    degree = jnp.dot(oh_dst.T, emask, preferred_element_type=f32)  # [N, 1]
    agg = agg / jnp.maximum(degree, 1.0)

    n2w1 = n2w1_ref[:]
    out = (jnp.dot(x.astype(wdt), n2w1[:c], preferred_element_type=f32)
           + jnp.dot(agg.astype(wdt), n2w1[c:], preferred_element_type=f32)
           + n2b1_ref[:].astype(f32))
    out = gelu_exact(out)
    out = jnp.dot(out.astype(wdt), n2w2_ref[:],
                  preferred_element_type=f32) + n2b2_ref[:].astype(f32)

    # GraphNorm (fp32; reference upcasts to fp64, :99-102).  Under
    # graph packing the per-graph stats reduce through a [N, G] graph
    # one-hot (same pattern as gat_kernel._kernel); unpacked keeps the
    # plain column sums.
    if n_graphs > 1:
        npg = n // n_graphs
        g_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n, n_graphs), 0) // npg
        g_col = jax.lax.broadcasted_iota(jnp.int32, (n, n_graphs), 1)
        oh_g = (g_iota == g_col).astype(f32)                 # [N, G]
        count = jnp.maximum(
            jnp.dot(oh_g.T, nmask, preferred_element_type=f32), 1.0)
        mean_g = jnp.dot(oh_g.T, out * nmask,
                         preferred_element_type=f32) / count  # [G, C]
        mean = jnp.dot(oh_g, mean_g, preferred_element_type=f32)
        shifted = out - gn_a_ref[:].astype(f32) * mean
        var_g = jnp.dot(oh_g.T, shifted * shifted * nmask,
                        preferred_element_type=f32) / count
        var = jnp.dot(oh_g, var_g, preferred_element_type=f32)
    else:
        count = jnp.maximum(jnp.sum(nmask, axis=0, keepdims=True), 1.0)
        mean = jnp.sum(out * nmask, axis=0, keepdims=True) / count
        shifted = out - gn_a_ref[:].astype(f32) * mean
        var = jnp.sum(shifted * shifted * nmask, axis=0,
                      keepdims=True) / count
    normed = shifted * jax.lax.rsqrt(var + eps) * nmask
    out = normed * gn_w_ref[:].astype(f32) + gn_b_ref[:].astype(f32)
    x_out_ref[:] = out.astype(x_out_ref.dtype)


def _pick_pack(n: int, e: int) -> int:
    """Graphs-per-program heuristic for ``pack="auto"`` — the same
    shape rule as the GAT kernels (gat_train.py:_pick_pack): fill the
    per-program rows toward the MXU's 128 under the 384-edge VMEM
    budget.  Packing amortizes per-program overhead, the dominant cost
    on small buckets."""
    return max(min(128 // max(n, 1), 384 // max(e, 1), 8), 1)


def fused_metalayer(x, e_attr, src, dst, edge_mask, node_mask, params,
                    interpret: bool = False, pack=None):
    """``x [B,N,C]``, ``e_attr [B,E,C]`` -> (x_out [B,N,C], e_out [B,E,C]).

    ``params``: ew1/eb1/ew2/eb2 (edge MLP), n1w1/n1b1/n1w2/n1b2,
    n2w1/n2b1/n2w2/n2b2 (node MLPs), gn_w/gn_b/gn_a (GraphNorm).

    ``pack``: graphs per grid program — an int, ``"auto"`` for the
    shape heuristic, or ``None``/1 unpacked.  Block-diagonal incidence
    + a [N, G] graph one-hot for the GraphNorm stats; exactness pinned
    by ``tests/test_metalayer_kernel.py``.
    """
    b, n, c = x.shape
    e = src.shape[1]
    if pack == "auto":
        g = _pick_pack(n, e)
    else:
        g = pack if pack else 1
        g = max(min(g, 128 // max(n, 1), 384 // max(e, 1)), 1)
    if g > 1:
        pad = (-b) % g
        if pad:
            def padb(t):
                return jnp.concatenate(
                    [t, jnp.zeros((pad,) + t.shape[1:], t.dtype)], axis=0)
            x, e_attr, src, dst = map(padb, (x, e_attr, src, dst))
            edge_mask, node_mask = padb(edge_mask), padb(node_mask)
        bp = (b + pad) // g
        offs = (jnp.arange(g, dtype=jnp.int32) * n)[None, :, None]
        src_p = (src.reshape(bp, g, e).astype(jnp.int32)
                 + offs).reshape(bp, g * e)
        dst_p = (dst.reshape(bp, g, e).astype(jnp.int32)
                 + offs).reshape(bp, g * e)
        x_out, e_out = _metalayer_call(
            x.reshape(bp, g * n, c), e_attr.reshape(bp, g * e, c),
            src_p, dst_p, edge_mask.reshape(bp, g * e),
            node_mask.reshape(bp, g * n), params, interpret, n_graphs=g)
        return (x_out.reshape(bp * g, n, c)[:b],
                e_out.reshape(bp * g, e, c)[:b])
    return _metalayer_call(x, e_attr, src, dst, edge_mask, node_mask,
                           params, interpret, n_graphs=1)


def _metalayer_call(x, e_attr, src, dst, edge_mask, node_mask, params,
                    interpret: bool, n_graphs: int):
    b, n, c = x.shape
    e = src.shape[1]
    dtype = x.dtype
    f32 = jnp.float32
    # big blocks travel HBM<->VMEM at the model's native dtype (bf16
    # halves the DMA); the kernel upcasts on load
    ship = jnp.bfloat16 if dtype == jnp.bfloat16 else f32

    def in2(shape):
        return pl.BlockSpec((None,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    x_out, e_out = pl.pallas_call(
        functools.partial(_kernel, n_graphs=n_graphs),
        grid=(b,),
        in_specs=[
            in2((n, c)), in2((e, c)),
            in2((e, 1)), in2((e, 1)), in2((e, 1)), in2((n, 1)),
            bcast((3 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((2 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((2 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((1, c)), bcast((1, c)), bcast((1, c)),
        ],
        out_specs=(
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, e, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), ship),
            jax.ShapeDtypeStruct((b, e, c), ship),
        ),
        interpret=interpret,
    )(
        x.astype(ship), e_attr.astype(ship),
        src[..., None].astype(jnp.int32), dst[..., None].astype(jnp.int32),
        edge_mask[..., None].astype(f32), node_mask[..., None].astype(f32),
        params["ew1"].astype(ship), params["eb1"][None].astype(f32),
        params["ew2"].astype(ship), params["eb2"][None].astype(f32),
        params["n1w1"].astype(ship), params["n1b1"][None].astype(f32),
        params["n1w2"].astype(ship), params["n1b2"][None].astype(f32),
        params["n2w1"].astype(ship), params["n2b1"][None].astype(f32),
        params["n2w2"].astype(ship), params["n2b2"][None].astype(f32),
        params["gn_w"][None].astype(f32), params["gn_b"][None].astype(f32),
        params["gn_a"][None].astype(f32),
    )
    return x_out.astype(dtype), e_out.astype(dtype)


def metalayer_reference(x, e_attr, src, dst, edge_mask, node_mask, params,
                        interpret: bool = False, pack=None):
    """Op-by-op XLA formulation of the same math (training path).

    ``interpret``/``pack`` are accepted-and-ignored for signature
    parity with :func:`fused_metalayer` / ``fused_metalayer_train``
    (the op-by-op path has no kernel grid), so the three
    implementations stay drop-in interchangeable."""
    del interpret, pack
    f32 = jnp.float32
    b, n, c = x.shape
    xf = x.astype(f32)
    ef = e_attr.astype(f32)
    oh_src = jax.nn.one_hot(src, n, dtype=f32) * edge_mask[..., None]
    oh_dst = jax.nn.one_hot(dst, n, dtype=f32) * edge_mask[..., None]
    xs = jnp.einsum("ben,bnc->bec", oh_src, xf)
    xd = jnp.einsum("ben,bnc->bec", oh_dst, xf)
    ew1 = params["ew1"].astype(f32)
    h = (xs @ ew1[:c] + xd @ ew1[c:2 * c] + ef @ ew1[2 * c:]
         + params["eb1"].astype(f32))
    h = jax.nn.gelu(h, approximate=False)
    e_out = h @ params["ew2"].astype(f32) + params["eb2"].astype(f32)

    n1w1 = params["n1w1"].astype(f32)
    m = xs @ n1w1[:c] + e_out @ n1w1[c:] + params["n1b1"].astype(f32)
    m = jax.nn.gelu(m, approximate=False)
    m = m @ params["n1w2"].astype(f32) + params["n1b2"].astype(f32)
    m = m * edge_mask[..., None]
    agg = jnp.einsum("ben,bec->bnc", oh_dst, m)
    degree = jnp.maximum(jnp.sum(oh_dst, axis=1), 1.0)
    agg = agg / degree[..., None]

    n2w1 = params["n2w1"].astype(f32)
    out = xf @ n2w1[:c] + agg @ n2w1[c:] + params["n2b1"].astype(f32)
    out = jax.nn.gelu(out, approximate=False)
    out = out @ params["n2w2"].astype(f32) + params["n2b2"].astype(f32)

    nm = node_mask[..., None].astype(f32)
    count = jnp.maximum(jnp.sum(nm, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(out * nm, axis=1, keepdims=True) / count
    shifted = out - params["gn_a"].astype(f32) * mean
    var = jnp.sum(shifted * shifted * nm, axis=1, keepdims=True) / count
    normed = shifted * jax.lax.rsqrt(var + 1e-5) * nm
    out = normed * params["gn_w"].astype(f32) + params["gn_b"].astype(f32)
    return out.astype(x.dtype), e_out.astype(x.dtype)
