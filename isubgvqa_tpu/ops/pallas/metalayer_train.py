"""Differentiable fused MetaLayer — the Pallas training path for the
scene-graph encoder's message round.

Companion of :mod:`.gat_train` for the encoder's MetaLayer + GraphNorm
(reference ``scene_graph_encoder.py:99-146``): a :func:`jax.custom_vjp`
whose forward is the inference kernel's math
(:mod:`.metalayer_kernel`) and whose backward is a second Pallas
kernel that *recomputes* the forward in VMEM from the inputs and walks
the chain in reverse — residuals are only the layer inputs, so the
``[E, 3C]`` concat and every per-edge MLP activation stay out of HBM
in both directions.  Parameter gradients accumulate across the
sequential TPU grid into shared output blocks.

Gradient-exact vs ``jax.grad`` of
:func:`~.metalayer_kernel.metalayer_reference` (pinned by
``tests/test_metalayer_train.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import gelu_exact, gelu_grad_exact

_PKEYS = ("ew1", "eb1", "ew2", "eb2", "n1w1", "n1b1", "n1w2", "n1b2",
          "n2w1", "n2b1", "n2w2", "n2b2", "gn_w", "gn_b", "gn_a")


def _bwd_kernel(
    x_ref, e_ref, src_ref, dst_ref, emask_ref, nmask_ref,
    ew1_ref, eb1_ref, ew2_ref, eb2_ref,
    n1w1_ref, n1b1_ref, n1w2_ref, n1b2_ref,
    n2w1_ref, n2b1_ref, n2w2_ref, n2b2_ref,
    gn_w_ref, gn_b_ref, gn_a_ref,
    dxo_ref,      # [N, C] cotangent of x_out
    deo_ref,      # [E, C] cotangent of e_out
    # per-graph outputs
    dx_ref,       # [N, C]
    de_ref,       # [E, C]
    # accumulated parameter gradients
    dew1_ref, deb1_ref, dew2_ref, deb2_ref,
    dn1w1_ref, dn1b1_ref, dn1w2_ref, dn1b2_ref,
    dn2w1_ref, dn2b1_ref, dn2w2_ref, dn2b2_ref,
    dgn_w_ref, dgn_b_ref, dgn_a_ref,
    *,
    eps: float = 1e-5,
):
    f32 = jnp.float32
    n = x_ref.shape[0]
    e = src_ref.shape[0]
    c = x_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dew1_ref, deb1_ref, dew2_ref, deb2_ref,
                  dn1w1_ref, dn1b1_ref, dn1w2_ref, dn1b2_ref,
                  dn2w1_ref, dn2b1_ref, dn2w2_ref, dn2b2_ref,
                  dgn_w_ref, dgn_b_ref, dgn_a_ref):
            r[:] = jnp.zeros_like(r)

    # ---- recompute the forward (metalayer_kernel._kernel math)
    x = x_ref[:].astype(f32)
    eattr = e_ref[:].astype(f32)
    emask = emask_ref[:]
    nmask = nmask_ref[:]
    ew1 = ew1_ref[:].astype(f32)
    ew2 = ew2_ref[:].astype(f32)
    n1w1 = n1w1_ref[:].astype(f32)
    n1w2 = n1w2_ref[:].astype(f32)
    n2w1 = n2w1_ref[:].astype(f32)
    n2w2 = n2w2_ref[:].astype(f32)
    gn_w = gn_w_ref[:].astype(f32)
    gn_a = gn_a_ref[:].astype(f32)

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    oh_src = (src_ref[:] == node_iota).astype(f32) * emask
    oh_dst = (dst_ref[:] == node_iota).astype(f32) * emask

    xs = jnp.dot(oh_src, x, preferred_element_type=f32)
    xd = jnp.dot(oh_dst, x, preferred_element_type=f32)

    h1 = (jnp.dot(xs, ew1[:c], preferred_element_type=f32)
          + jnp.dot(xd, ew1[c:2 * c], preferred_element_type=f32)
          + jnp.dot(eattr, ew1[2 * c:], preferred_element_type=f32)
          + eb1_ref[:].astype(f32))
    hg = gelu_exact(h1)
    e_out = jnp.dot(hg, ew2, preferred_element_type=f32) \
        + eb2_ref[:].astype(f32)

    m1 = (jnp.dot(xs, n1w1[:c], preferred_element_type=f32)
          + jnp.dot(e_out, n1w1[c:], preferred_element_type=f32)
          + n1b1_ref[:].astype(f32))
    mg = gelu_exact(m1)
    m2 = jnp.dot(mg, n1w2, preferred_element_type=f32) \
        + n1b2_ref[:].astype(f32)
    m3 = m2 * emask
    degree = jnp.dot(oh_dst.T, emask, preferred_element_type=f32)
    deg_safe = jnp.maximum(degree, 1.0)
    agg = jnp.dot(oh_dst.T, m3, preferred_element_type=f32) / deg_safe

    o1 = (jnp.dot(x, n2w1[:c], preferred_element_type=f32)
          + jnp.dot(agg, n2w1[c:], preferred_element_type=f32)
          + n2b1_ref[:].astype(f32))
    og = gelu_exact(o1)
    o2 = jnp.dot(og, n2w2, preferred_element_type=f32) \
        + n2b2_ref[:].astype(f32)

    count = jnp.maximum(jnp.sum(nmask, axis=0, keepdims=True), 1.0)
    mean = jnp.sum(o2 * nmask, axis=0, keepdims=True) / count
    shifted = o2 - gn_a * mean
    var = jnp.sum(shifted * shifted * nmask, axis=0, keepdims=True) / count
    r = jax.lax.rsqrt(var + eps)
    normed = shifted * r * nmask

    # ---- reverse pass
    dxo = dxo_ref[:]
    dgn_w_ref[:] += jnp.sum(dxo * normed, axis=0, keepdims=True)
    dgn_b_ref[:] += jnp.sum(dxo, axis=0, keepdims=True)
    d_normed = dxo * gn_w
    d_sh = d_normed * r * nmask
    d_r = jnp.sum(d_normed * shifted * nmask, axis=0, keepdims=True)
    d_var = d_r * (-0.5) * r * r * r
    d_sh = d_sh + 2.0 * shifted * nmask * d_var / count
    d_mean_col = jnp.sum(d_sh, axis=0, keepdims=True)
    dgn_a_ref[:] += -d_mean_col * mean
    d_o2 = d_sh + nmask * (-gn_a * d_mean_col) / count

    d_og = jnp.dot(d_o2, n2w2.T, preferred_element_type=f32)
    dn2w2_ref[:] += jnp.dot(og.T, d_o2, preferred_element_type=f32)
    dn2b2_ref[:] += jnp.sum(d_o2, axis=0, keepdims=True)
    d_o1 = d_og * gelu_grad_exact(o1)
    dx = jnp.dot(d_o1, n2w1[:c].T, preferred_element_type=f32)
    d_agg = jnp.dot(d_o1, n2w1[c:].T, preferred_element_type=f32)
    dn2w1_ref[:c] += jnp.dot(x.T, d_o1, preferred_element_type=f32)
    dn2w1_ref[c:] += jnp.dot(agg.T, d_o1, preferred_element_type=f32)
    dn2b1_ref[:] += jnp.sum(d_o1, axis=0, keepdims=True)

    d_m3 = jnp.dot(oh_dst, d_agg / deg_safe, preferred_element_type=f32)
    d_m2 = d_m3 * emask
    d_mg = jnp.dot(d_m2, n1w2.T, preferred_element_type=f32)
    dn1w2_ref[:] += jnp.dot(mg.T, d_m2, preferred_element_type=f32)
    dn1b2_ref[:] += jnp.sum(d_m2, axis=0, keepdims=True)
    d_m1 = d_mg * gelu_grad_exact(m1)
    d_xs = jnp.dot(d_m1, n1w1[:c].T, preferred_element_type=f32)
    d_eout = deo_ref[:] + jnp.dot(d_m1, n1w1[c:].T,
                                  preferred_element_type=f32)
    dn1w1_ref[:c] += jnp.dot(xs.T, d_m1, preferred_element_type=f32)
    dn1w1_ref[c:] += jnp.dot(e_out.T, d_m1, preferred_element_type=f32)
    dn1b1_ref[:] += jnp.sum(d_m1, axis=0, keepdims=True)

    d_hg = jnp.dot(d_eout, ew2.T, preferred_element_type=f32)
    dew2_ref[:] += jnp.dot(hg.T, d_eout, preferred_element_type=f32)
    deb2_ref[:] += jnp.sum(d_eout, axis=0, keepdims=True)
    d_h1 = d_hg * gelu_grad_exact(h1)
    d_xs = d_xs + jnp.dot(d_h1, ew1[:c].T, preferred_element_type=f32)
    d_xd = jnp.dot(d_h1, ew1[c:2 * c].T, preferred_element_type=f32)
    de_ref[:] = jnp.dot(d_h1, ew1[2 * c:].T, preferred_element_type=f32)
    dew1_ref[:c] += jnp.dot(xs.T, d_h1, preferred_element_type=f32)
    dew1_ref[c:2 * c] += jnp.dot(xd.T, d_h1, preferred_element_type=f32)
    dew1_ref[2 * c:] += jnp.dot(eattr.T, d_h1, preferred_element_type=f32)
    deb1_ref[:] += jnp.sum(d_h1, axis=0, keepdims=True)

    dx = dx + jnp.dot(oh_src.T, d_xs, preferred_element_type=f32)
    dx = dx + jnp.dot(oh_dst.T, d_xd, preferred_element_type=f32)
    dx_ref[:] = dx


def _metalayer_bwd_call(x, e_attr, src, dst, edge_mask, node_mask, params,
                        dxo, deo, interpret):
    from .metalayer_kernel import fused_metalayer  # noqa: F401 (doc link)

    b, n, c = x.shape
    e = src.shape[1]
    f32 = jnp.float32
    ship = jnp.bfloat16 if x.dtype == jnp.bfloat16 else f32

    def in2(shape):
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    p = {k: params[k].astype(f32) for k in _PKEYS}
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
            in2((n, c)), in2((e, c)),
        ],
        out_specs=(
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, e, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bcast((3 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((2 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((2 * c, c)), bcast((1, c)),
            bcast((c, c)), bcast((1, c)),
            bcast((1, c)), bcast((1, c)), bcast((1, c)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), f32),
            jax.ShapeDtypeStruct((b, e, c), f32),
            jax.ShapeDtypeStruct((3 * c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((2 * c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((2 * c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        interpret=interpret,
    )(
        x.astype(ship), e_attr.astype(ship),
        src[..., None].astype(jnp.int32), dst[..., None].astype(jnp.int32),
        edge_mask[..., None].astype(f32), node_mask[..., None].astype(f32),
        p["ew1"], p["eb1"][None], p["ew2"], p["eb2"][None],
        p["n1w1"], p["n1b1"][None], p["n1w2"], p["n1b2"][None],
        p["n2w1"], p["n2b1"][None], p["n2w2"], p["n2b2"][None],
        p["gn_w"][None], p["gn_b"][None], p["gn_a"][None],
        dxo.astype(f32), deo.astype(f32),
    )
    (dx, de, dew1, deb1, dew2, deb2, dn1w1, dn1b1, dn1w2, dn1b2,
     dn2w1, dn2b1, dn2w2, dn2b2, dgn_w, dgn_b, dgn_a) = outs
    dparams = {
        "ew1": dew1, "eb1": deb1[0], "ew2": dew2, "eb2": deb2[0],
        "n1w1": dn1w1, "n1b1": dn1b1[0], "n1w2": dn1w2, "n1b2": dn1b2[0],
        "n2w1": dn2w1, "n2b1": dn2b1[0], "n2w2": dn2w2, "n2b2": dn2b2[0],
        "gn_w": dgn_w[0], "gn_b": dgn_b[0], "gn_a": dgn_a[0],
    }
    return dx, de, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_metalayer_train(x, e_attr, src, dst, edge_mask, node_mask,
                          params, interpret=False, pack=None):
    """Fused MetaLayer round with a Pallas backward — drop-in for
    :func:`~.metalayer_kernel.metalayer_reference` during training,
    sharing the same parameters.  Returns ``(x_out, e_out)``.

    ``pack`` (int / ``"auto"`` / None) packs the *forward* kernel's
    grid programs (:func:`~.metalayer_kernel.fused_metalayer`); the
    backward kernel runs per-graph either way (its cost is small next
    to the four GAT conv backwards)."""
    from .metalayer_kernel import fused_metalayer

    return fused_metalayer(x, e_attr, src, dst, edge_mask, node_mask,
                           params, interpret=interpret, pack=pack)


def _vjp_fwd(x, e_attr, src, dst, edge_mask, node_mask, params, interpret,
             pack):
    from .metalayer_kernel import fused_metalayer

    out = fused_metalayer(x, e_attr, src, dst, edge_mask, node_mask,
                          params, interpret=interpret, pack=pack)
    return out, (x, e_attr, src, dst, edge_mask, node_mask, params)


def _vjp_bwd(interpret, pack, residuals, cts):
    x, e_attr, src, dst, edge_mask, node_mask, params = residuals
    dxo, deo = cts
    dx, de, dparams = _metalayer_bwd_call(
        x, e_attr, src, dst, edge_mask, node_mask, params, dxo, deo,
        interpret)
    f0 = jax.dtypes.float0
    dparams_full = {k: dparams[k].astype(params[k].dtype) for k in _PKEYS}
    for k in params:
        if k not in dparams_full:
            dparams_full[k] = jnp.zeros_like(params[k])
    return (
        dx.astype(x.dtype),
        de.astype(e_attr.dtype),
        np.zeros(src.shape, dtype=f0),
        np.zeros(dst.shape, dtype=f0),
        np.zeros(edge_mask.shape, dtype=f0),
        np.zeros(node_mask.shape, dtype=f0),
        dparams_full,
    )


fused_metalayer_train.defvjp(_vjp_fwd, _vjp_bwd)


def metalayer_bwd_flops(n: int, e: int, c: int = 300) -> float:
    """Analytic FLOPs of one :func:`_bwd_kernel` program: the in-VMEM
    forward recompute (executed FLOPs — the price of inputs-only
    residuals) plus the reverse chain.  Matmul-exact, elementwise at
    ~1 FLOP/op, gelu/gelu-grad at ~12 — the same convention as
    :func:`~.gat_kernel.metalayer_kernel_flops`, which covers the
    forward kernel this VJP pairs with."""
    fl = 0.0
    # ---- recompute (metalayer_kernel._kernel math + GraphNorm stats)
    fl += 2 * e * n                          # one-hot compares
    fl += 2 * (2 * e * n * c)                # xs, xd gathers
    fl += 3 * (2 * e * c * c) + 12 * e * c   # edge MLP in + gelu
    fl += 2 * e * c * c                      # edge MLP out
    fl += 2 * (2 * e * c * c) + 12 * e * c   # node mlp1 in + gelu
    fl += 2 * e * c * c                      # node mlp1 out
    fl += 2 * e * n * c + 2 * e * n          # agg scatter + degree
    fl += 2 * (2 * n * c * c) + 12 * n * c   # node mlp2 in + gelu
    fl += 2 * n * c * c                      # node mlp2 out
    fl += 10 * n * c                         # GraphNorm stats
    # ---- reverse chain
    fl += 17 * n * c                         # GraphNorm backward
    fl += 2 * (2 * n * c * c) + n * c        # d_og, dn2w2 (+ dn2b2)
    fl += 13 * n * c                         # d_o1 = d_og · gelu'
    fl += 4 * (2 * n * c * c) + n * c        # dx, d_agg, dn2w1 halves
    fl += 2 * e * n * c + n * c + e * c      # d_m3 scatter (+div, mask)
    fl += 2 * (2 * e * c * c) + e * c        # d_mg, dn1w2 (+ dn1b2)
    fl += 13 * e * c                         # d_m1 = d_mg · gelu'
    fl += 4 * (2 * e * c * c) + 2 * e * c    # d_xs, d_eout, dn1w1 halves
    fl += 2 * (2 * e * c * c) + e * c        # d_hg, dew2 (+ deb2)
    fl += 13 * e * c                         # d_h1 = d_hg · gelu'
    fl += 6 * (2 * e * c * c) + e * c        # d_xs+, d_xd, de, dew1
    fl += 2 * (2 * e * n * c)                # dx scatters
    return fl
