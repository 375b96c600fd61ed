"""Differentiable fused transformer layers (question-stack training
path): forward AND gradient exactness vs the explicit-mask XLA oracle,
in interpret mode on CPU.

The custom-VJP Pallas pairs (``ops/pallas/text_train.py``) must match
``jax.grad`` through ``models/layers.encoder_layer_reference`` /
``decoder_layer_reference`` for every differentiable input, with live
dropout reproduced exactly via shared pre-scaled keep masks (drawn
XLA-side by the modules, consumed by both paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isubgvqa_tpu.models.layers import (PostLNDecoderLayer,
                                        PostLNTransformerLayer,
                                        decoder_layer_reference,
                                        draw_decoder_dropout_masks,
                                        draw_encoder_dropout_masks,
                                        encoder_layer_reference)
from isubgvqa_tpu.models.question_decoder import QuestionDecoder
from isubgvqa_tpu.models.question_encoder import QuestionEncoder
from isubgvqa_tpu.ops.pallas import text_train
from isubgvqa_tpu.ops.pallas.text_train import (fused_decoder_layer_train,
                                                fused_encoder_layer_train)

D, H, F, L, T = 64, 4, 128, 8, 4


def _enc_setup(rng, b=4, l=L, dtype=None, rate=0.25):
    x = jnp.asarray(rng.normal(size=(b, l, D)).astype(np.float32))
    km = jnp.asarray((rng.random((b, l)) > 0.3).astype(np.float32))
    km = km.at[:, 0].set(1.0)
    layer = PostLNTransformerLayer(D, H, F, dropout=0.1, dtype=dtype)
    variables = layer.init(jax.random.PRNGKey(0), x,
                           key_bias=km[:, None, None, :])
    params = layer.bind(variables).kernel_params()
    masks = (draw_encoder_dropout_masks(
        jax.random.PRNGKey(7), b, l, dim=D, ffn_dim=F, num_heads=H,
        rate=rate) if rate > 0.0 else None)
    return x, km, masks, params, layer, variables


def _dec_setup(rng, b=4, t=T, l=L, rate=0.25):
    tgt = jnp.asarray(rng.normal(size=(b, t, D)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(b, l, D)).astype(np.float32))
    layer = PostLNDecoderLayer(D, H, F, dropout=0.1)
    variables = layer.init(jax.random.PRNGKey(0), tgt, mem)
    params = layer.bind(variables).kernel_params()
    masks = (draw_decoder_dropout_masks(
        jax.random.PRNGKey(9), b, t, l, dim=D, ffn_dim=F, num_heads=H,
        rate=rate) if rate > 0.0 else None)
    return tgt, mem, masks, params, layer, variables


# --------------------------------------------------------------------
# oracle sanity: masks=None reference == module deterministic path
# --------------------------------------------------------------------

def test_encoder_reference_matches_module_deterministic(rng):
    x, km, _, params, layer, variables = _enc_setup(rng, rate=0.0)
    ref = layer.apply(variables, x, key_bias=km[:, None, None, :],
                      deterministic=True)
    out = encoder_layer_reference(x, km, None, params, num_heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_reference_matches_module_deterministic(rng):
    tgt, mem, _, params, layer, variables = _dec_setup(rng, rate=0.0)
    ref = layer.apply(variables, tgt, mem, deterministic=True)
    out = decoder_layer_reference(tgt, mem, None, params, num_heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------
# forward exactness
# --------------------------------------------------------------------

def test_encoder_train_forward_matches_reference(rng):
    x, km, masks, params, _, _ = _enc_setup(rng)
    ref = encoder_layer_reference(x, km, masks, params, num_heads=H)
    out = fused_encoder_layer_train(x, km, masks, params, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encoder_train_forward_no_masks(rng):
    x, km, _, params, _, _ = _enc_setup(rng, rate=0.0)
    ref = encoder_layer_reference(x, km, None, params, num_heads=H)
    out = fused_encoder_layer_train(x, km, None, params, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_decoder_train_forward_matches_reference(rng):
    tgt, mem, masks, params, _, _ = _dec_setup(rng)
    ref = decoder_layer_reference(tgt, mem, masks, params, num_heads=H)
    out = fused_decoder_layer_train(tgt, mem, masks, params, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dropout_masks_change_output(rng):
    """Mutation power: the masks really gate the fused compute."""
    x, km, masks, params, _, _ = _enc_setup(rng)
    out_m = fused_encoder_layer_train(x, km, masks, params, H, True)
    out_n = fused_encoder_layer_train(x, km, None, params, H, True)
    assert not np.allclose(np.asarray(out_m), np.asarray(out_n),
                           rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------
# gradient exactness
# --------------------------------------------------------------------

def _enc_losses(km, masks, cot):
    def fused(x, params):
        out = fused_encoder_layer_train(x, km, masks, params, H, True)
        return jnp.sum(out * cot)

    def ref(x, params):
        out = encoder_layer_reference(x, km, masks, params, num_heads=H)
        return jnp.sum(out * cot)

    return fused, ref


def _assert_tree_close(gf, gr, rtol=5e-4, atol=5e-4):
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
    assert flat_f, "empty gradient tree"
    for path, leaf in flat_f:
        other = flat_r[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other),
                                   rtol=rtol, atol=atol,
                                   err_msg=jax.tree_util.keystr(path))
        assert float(jnp.abs(leaf).max()) > 0.0, \
            f"zero gradient at {jax.tree_util.keystr(path)}"


def test_encoder_train_grads_match_reference(rng):
    x, km, masks, params, _, _ = _enc_setup(rng)
    cot = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    fused, ref = _enc_losses(km, masks, cot)
    gf = jax.grad(fused, argnums=(0, 1))(x, params)
    gr = jax.grad(ref, argnums=(0, 1))(x, params)
    _assert_tree_close(gf, gr)


def test_encoder_train_grads_ragged_batch(rng):
    """B smaller than the question pack: padded questions must not leak
    into real rows' gradients."""
    x, km, masks, params, _, _ = _enc_setup(rng, b=3)
    cot = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    fused, ref = _enc_losses(km, masks, cot)
    gf = jax.grad(fused, argnums=(0, 1))(x, params)
    gr = jax.grad(ref, argnums=(0, 1))(x, params)
    _assert_tree_close(gf, gr)


def test_decoder_train_grads_match_reference(rng):
    tgt, mem, masks, params, _, _ = _dec_setup(rng)
    cot = jnp.asarray(rng.normal(size=tgt.shape).astype(np.float32))

    def fused(tgt, mem, params):
        out = fused_decoder_layer_train(tgt, mem, masks, params, H, True)
        return jnp.sum(out * cot)

    def ref(tgt, mem, params):
        out = decoder_layer_reference(tgt, mem, masks, params, num_heads=H)
        return jnp.sum(out * cot)

    gf = jax.grad(fused, argnums=(0, 1, 2))(tgt, mem, params)
    gr = jax.grad(ref, argnums=(0, 1, 2))(tgt, mem, params)
    _assert_tree_close(gf, gr)


def test_encoder_train_bf16_forward(rng):
    x, km, masks, params, _, _ = _enc_setup(rng, dtype=jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    ref = encoder_layer_reference(xb, km, masks, params, num_heads=H,
                                  dtype=jnp.bfloat16)
    out = fused_encoder_layer_train(xb, km, masks, params, H, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


# --------------------------------------------------------------------
# module-level wiring: fused train path == XLA fallback, same rngs
# --------------------------------------------------------------------

def test_question_encoder_train_fused_equals_fallback(rng, monkeypatch):
    ids = jnp.asarray(rng.integers(0, 100, size=(5, L)).astype(np.int32))
    mask = jnp.asarray((rng.random((5, L)) > 0.3).astype(np.int32))
    enc = QuestionEncoder(dim=D, num_heads=H, ffn_dim=F, num_layers=2,
                          vocab_size=128)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    rngs = {"dropout": jax.random.PRNGKey(3)}
    ref = enc.apply(variables, ids, mask, deterministic=False, rngs=rngs)
    monkeypatch.setattr(text_train, "FORCE_INTERPRET", True)
    out = enc.apply(variables, ids, mask, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_question_encoder_train_fused_grads_equal_fallback(rng,
                                                           monkeypatch):
    ids = jnp.asarray(rng.integers(0, 100, size=(3, L)).astype(np.int32))
    mask = jnp.asarray((rng.random((3, L)) > 0.3).astype(np.int32))
    enc = QuestionEncoder(dim=D, num_heads=H, ffn_dim=F, num_layers=1,
                          vocab_size=128)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    rngs = {"dropout": jax.random.PRNGKey(3)}

    def loss(variables):
        out = enc.apply(variables, ids, mask, deterministic=False,
                        rngs=rngs)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss)(variables)
    monkeypatch.setattr(text_train, "FORCE_INTERPRET", True)
    g_fused = jax.grad(loss)(variables)
    _assert_tree_close(g_fused, g_ref, rtol=1e-3, atol=1e-3)


def test_question_decoder_train_fused_equals_fallback(rng, monkeypatch):
    mem = jnp.asarray(rng.normal(size=(5, L, D)).astype(np.float32))
    dec = QuestionDecoder(n_instructions=T, dim=D, num_heads=H, ffn_dim=F,
                          num_layers=2)
    variables = dec.init(jax.random.PRNGKey(0), mem)
    rngs = {"dropout": jax.random.PRNGKey(4)}
    ref = dec.apply(variables, mem, deterministic=False, rngs=rngs)
    monkeypatch.setattr(text_train, "FORCE_INTERPRET", True)
    out = dec.apply(variables, mem, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_train_dropout_differs_from_deterministic(rng, monkeypatch):
    """The fused train path really applies dropout: with dropout > 0 it
    must differ from the deterministic output."""
    ids = jnp.asarray(rng.integers(0, 100, size=(4, L)).astype(np.int32))
    mask = jnp.ones((4, L), jnp.int32)
    enc = QuestionEncoder(dim=D, num_heads=H, ffn_dim=F, num_layers=1,
                          vocab_size=128)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    monkeypatch.setattr(text_train, "FORCE_INTERPRET", True)
    det = enc.apply(variables, ids, mask, deterministic=True)
    drop = enc.apply(variables, ids, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(det), np.asarray(drop),
                           rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------
# analytic FLOPs models
# --------------------------------------------------------------------

def test_text_train_flops_model_sane():
    from isubgvqa_tpu.ops.pallas.text_train import (
        decoder_layer_train_bwd_flops, decoder_layer_train_fwd_flops,
        encoder_layer_train_bwd_flops, encoder_layer_train_fwd_flops,
        text_stack_train_flops_per_batch)

    fwd = encoder_layer_train_fwd_flops(16, 8)
    bwd = encoder_layer_train_bwd_flops(16, 8)
    assert 0 < fwd < bwd                # bwd includes the recompute
    dfwd = decoder_layer_train_fwd_flops(16, 4, 8)
    dbwd = decoder_layer_train_bwd_flops(16, 4, 8)
    assert 0 < dfwd < dbwd
    f16 = text_stack_train_flops_per_batch(256, 16)
    f32tok = text_stack_train_flops_per_batch(256, 32)
    assert f32tok > f16 > 0
    # f32 models fuse the encoder only (decoder VMEM gate)
    assert text_stack_train_flops_per_batch(256, 16, bf16=False) < f16
