"""Shared building blocks: MLPs, post-LN transformer layers with the
reference's additive key-mask quirk, GraphNorm, and masked BatchNorm.

Everything runs batch-first with static shapes; matmuls carry
``preferred_element_type`` so the MXU accumulates in fp32 even under a
bf16 compute policy.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes


class MLP(nn.Module):
    """Linear stack with GELU between layers (and optionally after the
    last), mirroring the reference's ``torch.nn.Sequential`` MLPs."""

    features: Sequence[int]
    gelu_last: bool = True
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, dtype=self.dtype,
                         name=f"lin{i}")(x)
            if i < len(self.features) - 1 or self.gelu_last:
                x = nn.gelu(x, approximate=False)
        return x


class PositionalEncoding(nn.Module):
    """Sin/cos positional encoding (reference
    ``models/positional_encoding.py:5-22``).  Constructed but bypassed
    in the live path (``question_encoder.py:33-34``), kept for parity.
    """

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x):  # x: [B, L, D]
        pos = jnp.arange(self.max_len)[:, None]
        div = jnp.exp(jnp.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model))
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        return x + pe[None, : x.shape[1]]


class DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s subtree
    (``{kernel, bias}``, lecun-normal/zeros init) so the same params
    serve both the XLA composition and the fused text kernels
    (``ops/pallas/text_kernel.py``) — checkpoint trees and init draws
    stay identical to the previous ``nn.Dense`` modules."""

    in_dim: int
    out_dim: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_dim, self.out_dim))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_dim,))


class LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s subtree
    (``{scale, bias}``)."""

    dim: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))


def dense_apply(x, kernel, bias, dtype):
    """``nn.Dense.__call__`` numerics: promote operands to ``dtype``
    (flax semantics — bf16 models round operands, f32 models no-op),
    dot, add bias."""
    x, kernel, bias = flax_dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
    y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
    return y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))


def ln_apply(x, scale, bias, dtype, eps: float = 1e-6):
    """``nn.LayerNorm`` numerics over the last axis: f32 fast-variance
    stats, f32 normalization arithmetic, output cast to the flax
    canonical dtype (flax ``normalization.py``)."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(xf, axis=-1)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1) - mean * mean, 0.0)
    y = (x - mean[..., None]) * (jax.lax.rsqrt(var[..., None] + eps) * scale)
    y = y + bias
    return jnp.asarray(y, flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                         dtype=dtype))


def _attention(q, k, v, bias=None, dropout_rate=0.0, deterministic=True,
               dropout_rng=None, dtype=jnp.float32):
    """Scaled dot-product attention; ``bias`` is added to the logits
    (used for the reference's float ``src_key_padding_mask``, which
    torch *adds* rather than masks — ``question_encoder.py:35-37``)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(dtype), v,
                      preferred_element_type=jnp.float32).astype(dtype)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (joint QKV when
    self-attending is unnecessary for parity; separate projections).
    Params live in :class:`DenseParams` holders so the fused text
    kernels can consume the same tree (``kernel_params``)."""

    num_heads: int
    dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.q = DenseParams(self.dim, self.dim)
        self.k = DenseParams(self.dim, self.dim)
        self.v = DenseParams(self.dim, self.dim)
        self.out = DenseParams(self.dim, self.dim)

    def __call__(self, q_in, k_in, v_in, bias=None, deterministic=True):
        h, d = self.num_heads, self.dim // self.num_heads
        dtype = self.dtype or q_in.dtype

        def proj(x, p):
            return dense_apply(x, p.kernel, p.bias, self.dtype).reshape(
                x.shape[0], x.shape[1], h, d
            ).transpose(0, 2, 1, 3)

        q = proj(q_in, self.q)
        k = proj(k_in, self.k)
        v = proj(v_in, self.v)
        rng = self.make_rng("dropout") if (not deterministic and self.dropout > 0) else None
        out = _attention(q, k, v, bias=bias, dropout_rate=self.dropout,
                         deterministic=deterministic, dropout_rng=rng, dtype=dtype)
        out = out.transpose(0, 2, 1, 3).reshape(q_in.shape[0], q_in.shape[1], self.dim)
        return dense_apply(out, self.out.kernel, self.out.bias, self.dtype)

    def kernel_params(self, prefix: str = ""):
        """Projection params keyed for the fused text kernels."""
        return {
            prefix + "wq": self.q.kernel, prefix + "bq": self.q.bias,
            prefix + "wk": self.k.kernel, prefix + "bk": self.k.bias,
            prefix + "wv": self.v.kernel, prefix + "bv": self.v.bias,
            prefix + "wo": self.out.kernel, prefix + "bo": self.out.bias,
        }


class PostLNTransformerLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-LN, ReLU FFN) equivalent
    used by the question encoder (``question_encoder.py:22-25``)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.dim,
                                            self.dropout, dtype=self.dtype)
        self.norm1 = LNParams(self.dim)
        self.ffn1 = DenseParams(self.dim, self.ffn_dim)
        self.ffn2 = DenseParams(self.ffn_dim, self.dim)
        self.norm2 = LNParams(self.dim)

    @nn.compact
    def __call__(self, x, key_bias=None, deterministic=True):
        attn = self.self_attn(x, x, x, bias=key_bias,
                              deterministic=deterministic)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = ln_apply(x + attn, self.norm1.scale, self.norm1.bias, self.dtype)
        y = dense_apply(x, self.ffn1.kernel, self.ffn1.bias, self.dtype)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = dense_apply(y, self.ffn2.kernel, self.ffn2.bias, self.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return ln_apply(x + y, self.norm2.scale, self.norm2.bias, self.dtype)

    def kernel_params(self):
        """Param dict for ``text_kernel.fused_encoder_layer``."""
        return {
            **self.self_attn.kernel_params(),
            "n1s": self.norm1.scale, "n1b": self.norm1.bias,
            "w1": self.ffn1.kernel, "b1": self.ffn1.bias,
            "w2": self.ffn2.kernel, "b2": self.ffn2.bias,
            "n2s": self.norm2.scale, "n2b": self.norm2.bias,
        }


class PostLNDecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer equivalent (self-attn +
    cross-attn + FFN, post-LN) for the program decoder
    (``question_decoder.py:27-29``)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.dim,
                                            self.dropout, dtype=self.dtype)
        self.norm1 = LNParams(self.dim)
        self.cross_attn = MultiHeadAttention(self.num_heads, self.dim,
                                             self.dropout, dtype=self.dtype)
        self.norm2 = LNParams(self.dim)
        self.ffn1 = DenseParams(self.dim, self.ffn_dim)
        self.ffn2 = DenseParams(self.ffn_dim, self.dim)
        self.norm3 = LNParams(self.dim)

    @nn.compact
    def __call__(self, tgt, memory, memory_bias=None, deterministic=True):
        sa = self.self_attn(tgt, tgt, tgt, deterministic=deterministic)
        sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = ln_apply(tgt + sa, self.norm1.scale, self.norm1.bias,
                       self.dtype)
        ca = self.cross_attn(tgt, memory, memory, bias=memory_bias,
                             deterministic=deterministic)
        ca = nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = ln_apply(tgt + ca, self.norm2.scale, self.norm2.bias,
                       self.dtype)
        y = dense_apply(tgt, self.ffn1.kernel, self.ffn1.bias, self.dtype)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = dense_apply(y, self.ffn2.kernel, self.ffn2.bias, self.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return ln_apply(tgt + y, self.norm3.scale, self.norm3.bias,
                        self.dtype)

    def kernel_params(self):
        """Param dict for ``text_kernel.fused_decoder_layer``."""
        return {
            **self.self_attn.kernel_params("s"),
            "n1s": self.norm1.scale, "n1b": self.norm1.bias,
            **self.cross_attn.kernel_params("c"),
            "n2s": self.norm2.scale, "n2b": self.norm2.bias,
            "w1": self.ffn1.kernel, "b1": self.ffn1.bias,
            "w2": self.ffn2.kernel, "b2": self.ffn2.bias,
            "n3s": self.norm3.scale, "n3b": self.norm3.bias,
        }


def _keep_mask(rng, rate: float, shape):
    """Scaled dropout keep mask: values ``{0, 1/(1-rate)}`` f32 —
    multiplying by it reproduces ``nn.Dropout`` semantics
    (``where(keep, x/(1-p), 0)``) with the mask drawn once and shared
    between the fused Pallas training kernels and the XLA oracle."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return keep.astype(jnp.float32) / (1.0 - rate)


def draw_encoder_dropout_masks(rng, b, l, *, dim, ffn_dim, num_heads,
                               rate):
    """Per-layer dropout keep masks for one encoder layer (torch
    ``TransformerEncoderLayer`` sites: attention probabilities, after
    the attention output, after the FFN ReLU, after the FFN output —
    reference ``question_encoder.py:22-25``).  None when rate == 0."""
    if rate <= 0.0:
        return None
    ks = jax.random.split(rng, 4)
    return {
        "attn": _keep_mask(ks[0], rate, (b, num_heads, l, l)),
        "post_attn": _keep_mask(ks[1], rate, (b, l, dim)),
        "ffn": _keep_mask(ks[2], rate, (b, l, ffn_dim)),
        "post_ffn": _keep_mask(ks[3], rate, (b, l, dim)),
    }


def draw_decoder_dropout_masks(rng, b, t, l, *, dim, ffn_dim, num_heads,
                               rate):
    """Dropout keep masks for one decoder layer (self-attn probs, after
    self-attn, cross-attn probs, after cross-attn, after the FFN ReLU,
    after the FFN output — reference ``question_decoder.py:27-29``)."""
    if rate <= 0.0:
        return None
    ks = jax.random.split(rng, 6)
    return {
        "self_attn": _keep_mask(ks[0], rate, (b, num_heads, t, t)),
        "post_sa": _keep_mask(ks[1], rate, (b, t, dim)),
        "cross_attn": _keep_mask(ks[2], rate, (b, num_heads, t, l)),
        "post_ca": _keep_mask(ks[3], rate, (b, t, dim)),
        "ffn": _keep_mask(ks[4], rate, (b, t, ffn_dim)),
        "post_ffn": _keep_mask(ks[5], rate, (b, t, dim)),
    }


def _mul_keep(x, m):
    return x if m is None else x * m.astype(x.dtype)


def _mha_explicit(q_in, kv_in, params, prefix, bias, probs_keep,
                  num_heads, dtype):
    """:class:`MultiHeadAttention` numerics as a pure function over a
    ``kernel_params``-keyed dict, with the attention-probability
    dropout as an explicit pre-scaled keep mask ``[B, H, Lq, Lk]``."""
    b, lq, dim = q_in.shape
    dh = dim // num_heads

    def proj(x, w, bi):
        y = dense_apply(x, w, bi, dtype)
        return y.reshape(x.shape[0], x.shape[1], num_heads,
                         dh).transpose(0, 2, 1, 3)

    q = proj(q_in, params[prefix + "wq"], params[prefix + "bq"])
    k = proj(kv_in, params[prefix + "wk"], params[prefix + "bk"])
    v = proj(kv_in, params[prefix + "wv"], params[prefix + "bv"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    if probs_keep is not None:
        w = w * probs_keep.astype(w.dtype)
    ddt = dtype or q_in.dtype
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(ddt), v,
                     preferred_element_type=jnp.float32).astype(ddt)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, dim)
    return dense_apply(out, params[prefix + "wo"], params[prefix + "bo"],
                       dtype)


def encoder_layer_reference(x, key_mask, masks, params, *, num_heads=8,
                            dtype=None):
    """One post-LN encoder layer, op-by-op XLA, with explicit dropout
    keep masks — the differentiable oracle and fallback for
    :func:`~isubgvqa_tpu.ops.pallas.text_train.fused_encoder_layer_train`
    (same params, same masks ⇒ same outputs and gradients).

    ``x [B, L, D]``, ``key_mask [B, L]`` float (the reference's additive
    key-logit bias quirk, ``question_encoder.py:35-37``), ``masks`` as
    produced by :func:`draw_encoder_dropout_masks` (or None)."""
    m = masks or {}
    bias = key_mask.astype(jnp.float32)[:, None, None, :]
    attn = _mha_explicit(x, x, params, "", bias, m.get("attn"),
                         num_heads, dtype)
    attn = _mul_keep(attn, m.get("post_attn"))
    x = ln_apply(x + attn, params["n1s"], params["n1b"], dtype)
    y = dense_apply(x, params["w1"], params["b1"], dtype)
    y = nn.relu(y)
    y = _mul_keep(y, m.get("ffn"))
    y = dense_apply(y, params["w2"], params["b2"], dtype)
    y = _mul_keep(y, m.get("post_ffn"))
    return ln_apply(x + y, params["n2s"], params["n2b"], dtype)


def decoder_layer_reference(tgt, memory, masks, params, *, num_heads=8,
                            dtype=None):
    """One post-LN decoder layer (self-attn + cross-attn + FFN) with
    explicit dropout keep masks — oracle/fallback for
    ``text_train.fused_decoder_layer_train``.  The reference passes no
    memory padding mask (``question_decoder.py:65-67``) so none is
    taken here."""
    m = masks or {}
    sa = _mha_explicit(tgt, tgt, params, "s", None, m.get("self_attn"),
                       num_heads, dtype)
    sa = _mul_keep(sa, m.get("post_sa"))
    tgt = ln_apply(tgt + sa, params["n1s"], params["n1b"], dtype)
    ca = _mha_explicit(tgt, memory, params, "c", None,
                       m.get("cross_attn"), num_heads, dtype)
    ca = _mul_keep(ca, m.get("post_ca"))
    tgt = ln_apply(tgt + ca, params["n2s"], params["n2b"], dtype)
    y = dense_apply(tgt, params["w1"], params["b1"], dtype)
    y = nn.relu(y)
    y = _mul_keep(y, m.get("ffn"))
    y = dense_apply(y, params["w2"], params["b2"], dtype)
    y = _mul_keep(y, m.get("post_ffn"))
    return ln_apply(tgt + y, params["n3s"], params["n3b"], dtype)


class GraphNorm(nn.Module):
    """torch_geometric.nn.norm.GraphNorm equivalent
    (``scene_graph_encoder.py:33``, ``mgat.py:93-95``):
    ``w * (x − α·mean_g) / sqrt(var_g + eps) + b`` with learnable
    per-channel w, b, α, over the dense ``[B, N, C]`` node layout.
    The reference runs the SG-encoder instance in fp64
    (``scene_graph_encoder.py:99-102``); we compute in fp32 —
    validated to agree within 1e-5 at these scales."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, node_mask):
        from ..ops.dense_graph import graph_norm_dense

        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (self.dim,))
        return graph_norm_dense(x, node_mask, weight, bias, mean_scale,
                                self.eps)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows of a padded array, with running
    statistics and optional cross-device synchronization
    (``torch.nn.SyncBatchNorm`` parity, ``scene_graph_encoder.py:36-48``
    — sync happens automatically when the train step runs under a
    sharded mesh because the masked sums are computed with
    ``axis_name`` psum)."""

    dim: int
    momentum: float = 0.9   # torch momentum 0.1 == keep 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=True):
        """``x [..., C]`` normalized over all leading axes; ``mask``
        matches the leading axes."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.dim,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.dim,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))

        xf = x.astype(jnp.float32).reshape(-1, self.dim)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                count = jnp.asarray(xf.shape[0], jnp.float32)
                s1 = jnp.sum(xf, axis=0)
            else:
                m = mask.astype(jnp.float32).reshape(-1)[:, None]
                count = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            # two-pass (centered) variance, NOT E[x²]−mean²: the
            # one-pass form cancels catastrophically in f32 on
            # pixel-scale inputs (bbox coords ~0-800 lose ~5 digits),
            # perturbing every downstream gradient by ~1e-3 relative;
            # torch's native batch norm is Welford-style (pinned by the
            # trajectory golden test's first-moment cosine)
            d = xf - mean
            sq = jnp.sum(d * d if mask is None else d * d * m, axis=0)
            if self.axis_name is not None:
                sq = jax.lax.psum(sq, self.axis_name)
            var = jnp.maximum(sq / count, 0.0)
            if not self.is_initializing():
                # torch BatchNorm1d stores the Bessel-corrected
                # (unbiased) variance in running_var while normalizing
                # the batch with the biased one
                var_unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var_unbiased
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.reshape(x.shape).astype(x.dtype)
