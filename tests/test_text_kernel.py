"""Fused Pallas transformer-layer kernels (question stack) vs the XLA
module composition (interpret mode on CPU).

The kernels (``ops/pallas/text_kernel.py``) must reproduce
``PostLNTransformerLayer`` / ``PostLNDecoderLayer`` exactly — incl.
the reference's additive float key-padding mask quirk
(``question_encoder.py:35-37``) and the pack-block-diagonal attention
masking — and the module-level fused paths of ``QuestionEncoder`` /
``QuestionDecoder`` must match their XLA paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.models.layers import (PostLNDecoderLayer,
                                        PostLNTransformerLayer)
from isubgvqa_tpu.models.question_decoder import QuestionDecoder
from isubgvqa_tpu.models.question_encoder import QuestionEncoder
from isubgvqa_tpu.ops.pallas import text_kernel
from isubgvqa_tpu.ops.pallas.text_kernel import (fused_decoder_layer,
                                                 fused_encoder_layer)

D, H, F = 64, 4, 128


def _enc_setup(rng, b=5, l=16, dtype=None):
    x = jnp.asarray(rng.normal(size=(b, l, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((b, l)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    layer = PostLNTransformerLayer(D, H, F, dropout=0.1, dtype=dtype)
    variables = layer.init(jax.random.PRNGKey(0), x,
                           key_bias=mask[:, None, None, :])
    return x, mask, layer, variables


def _collect(layer, variables, x, *args, method_args=()):
    """Bind and pull the kernel param dict."""
    bound = layer.bind(variables)
    return bound.kernel_params()


def test_encoder_layer_kernel_matches_module(rng):
    x, mask, layer, variables = _enc_setup(rng)
    ref = layer.apply(variables, x, key_bias=mask[:, None, None, :],
                      deterministic=True)
    params = layer.bind(variables).kernel_params()
    out = fused_encoder_layer(x, mask, params, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encoder_layer_kernel_ragged_batch(rng):
    """B not a multiple of the row-budget pack: padded questions are
    dropped and real rows stay exact (block-diagonal masking keeps the
    pack's questions independent)."""
    x, mask, layer, variables = _enc_setup(rng, b=3, l=16)
    ref = layer.apply(variables, x, key_bias=mask[:, None, None, :],
                      deterministic=True)
    out = fused_encoder_layer(x, mask, layer.bind(variables).kernel_params(),
                              num_heads=H, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encoder_layer_kernel_final_ln(rng):
    """final_ln folds an extra LayerNorm into the kernel call."""
    from isubgvqa_tpu.models.layers import ln_apply

    x, mask, layer, variables = _enc_setup(rng)
    s = jnp.asarray(np.abs(rng.normal(size=(D,))).astype(np.float32) + 0.5)
    b_ = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    ref = layer.apply(variables, x, key_bias=mask[:, None, None, :],
                      deterministic=True)
    ref = ln_apply(ref, s, b_, None)
    out = fused_encoder_layer(x, mask, layer.bind(variables).kernel_params(),
                              num_heads=H, final_ln=(s, b_), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encoder_layer_kernel_key_bias_quirk(rng):
    """The float attention mask is ADDED to key logits (not used to
    mask); flipping a pad bit must change the output — pins that the
    kernel reproduces the quirk rather than masking."""
    x, mask, layer, variables = _enc_setup(rng)
    params = layer.bind(variables).kernel_params()
    out1 = fused_encoder_layer(x, mask, params, num_heads=H, interpret=True)
    mask2 = mask.at[:, -1].set(1.0 - mask[:, -1])
    out2 = fused_encoder_layer(x, mask2, params, num_heads=H, interpret=True)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_decoder_layer_kernel_matches_module(rng):
    b, t, l = 5, 4, 16
    tgt = jnp.asarray(rng.normal(size=(b, t, D)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(b, l, D)).astype(np.float32))
    layer = PostLNDecoderLayer(D, H, F, dropout=0.1)
    variables = layer.init(jax.random.PRNGKey(0), tgt, mem)
    ref = layer.apply(variables, tgt, mem, deterministic=True)
    out = fused_decoder_layer(tgt, mem, layer.bind(variables).kernel_params(),
                              num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_question_encoder_fused_path_matches_xla(rng, monkeypatch):
    """Module-level: the fused QuestionEncoder path (FORCE_INTERPRET)
    equals the XLA composition, final norm included."""
    ids = jnp.asarray(rng.integers(0, 100, size=(6, 16)).astype(np.int32))
    mask = jnp.asarray((rng.random((6, 16)) > 0.3).astype(np.int32))
    enc = QuestionEncoder(dim=D, num_heads=H, ffn_dim=F, num_layers=2,
                          vocab_size=128)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    ref = enc.apply(variables, ids, mask, deterministic=True)
    monkeypatch.setattr(text_kernel, "FORCE_INTERPRET", True)
    out = enc.apply(variables, ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_question_decoder_fused_path_matches_xla(rng, monkeypatch):
    mem = jnp.asarray(rng.normal(size=(6, 16, D)).astype(np.float32))
    dec = QuestionDecoder(n_instructions=4, dim=D, num_heads=H, ffn_dim=F,
                          num_layers=2)
    variables = dec.init(jax.random.PRNGKey(0), mem)
    ref = dec.apply(variables, mem, deterministic=True)
    monkeypatch.setattr(text_kernel, "FORCE_INTERPRET", True)
    out = dec.apply(variables, mem, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encoder_kernel_bf16_ship(rng):
    """bf16 inputs exercise the bf16 shipping branch; agreement at
    bf16-appropriate tolerance."""
    x, mask, layer, variables = _enc_setup(rng, dtype=jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    ref = layer.apply(variables, xb, key_bias=mask[:, None, None, :],
                      deterministic=True)
    out = fused_encoder_layer(xb, mask,
                              layer.bind(variables).kernel_params(),
                              num_heads=H, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_training_path_unchanged_by_refactor(rng):
    """The XLA composition with dropout live must still run (params
    from holders) and differ from the deterministic output."""
    x, mask, layer, variables = _enc_setup(rng)
    det = layer.apply(variables, x, key_bias=mask[:, None, None, :],
                      deterministic=True)
    drop = layer.apply(variables, x, key_bias=mask[:, None, None, :],
                       deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert det.shape == drop.shape
    assert not np.allclose(np.asarray(det), np.asarray(drop))


def test_text_flops_model_matches_xla_cost_analysis(rng):
    """Cross-validation: the analytic text-kernel FLOPs models agree
    with XLA cost analysis of the numerically-identical module
    composition at TB=1 (no packing waste) — the same validation
    discipline as the graph-kernel models (bench.py module doc)."""
    from isubgvqa_tpu.ops.pallas.text_kernel import (
        fused_decoder_layer_flops, fused_encoder_layer_flops)

    b, l, t = 4, 16, 4
    x, mask, layer, variables = _enc_setup(rng, b=b, l=l)

    def f_enc(x, mask):
        return layer.apply(variables, x,
                           key_bias=mask[:, None, None, :],
                           deterministic=True)

    ca = jax.jit(f_enc).lower(x, mask).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla = float(ca["flops"])
    analytic = b * fused_encoder_layer_flops(l, 1, d=D, f=F, heads=H)
    assert abs(xla - analytic) / analytic < 0.02, (xla, analytic)

    dec = PostLNDecoderLayer(D, H, F, dropout=0.1)
    tgt = jnp.asarray(rng.normal(size=(b, t, D)).astype(np.float32))
    dvars = dec.init(jax.random.PRNGKey(0), tgt, x)

    def f_dec(tgt, mem):
        return dec.apply(dvars, tgt, mem, deterministic=True)

    ca = jax.jit(f_dec).lower(tgt, x).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla = float(ca["flops"])
    analytic = b * fused_decoder_layer_flops(l, t, 1, d=D, f=F, heads=H)
    assert abs(xla - analytic) / analytic < 0.02, (xla, analytic)


def test_text_stack_flops_per_batch_shape():
    """Batch helper: ceil-division over the row budget, decoder only
    counted for bf16 models, monotone in tokens and batch."""
    from isubgvqa_tpu.ops.pallas.text_kernel import (
        text_stack_flops_per_batch)

    f16 = text_stack_flops_per_batch(2048, 16)
    f32tok = text_stack_flops_per_batch(2048, 32)
    assert f32tok > f16
    assert text_stack_flops_per_batch(4096, 16) > f16
    assert (text_stack_flops_per_batch(2048, 16, bf16=False)
            < f16)                      # f32: encoder-only fuses
