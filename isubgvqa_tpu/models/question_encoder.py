"""Question encoder: CLIP-style text embedding + 4-layer transformer.

Equivalent of the reference's ``QuestionEncoder``
(``models/question_encoder.py:6-38``) fed by a deep copy of CLIP's text
embeddings (``isubgvqa.py:119-121`` — token table + learned positional
table).  The pretrained tables arrive either via ``--clip_weights``
at fresh init (:func:`isubgvqa_tpu.models.build.apply_clip_text_tables`
over :func:`isubgvqa_tpu.convert.load_clip_text_tables`) or via full
checkpoint conversion (:mod:`isubgvqa_tpu.convert`); without either,
the tables train from random init.

Reference quirk reproduced: torch's ``src_key_padding_mask`` is passed
as a *float* (``question_encoder.py:36``), which torch treats as an
additive attention bias — so real tokens get +1 on their key logits
and padding is **not** masked out.  We add the same bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.platform import on_tpu_backend as _on_tpu
from .layers import (LNParams, PostLNTransformerLayer,
                     draw_encoder_dropout_masks, encoder_layer_reference,
                     ln_apply)


class TextEmbedding(nn.Module):
    """CLIPTextEmbeddings equivalent: token + learned position tables."""

    vocab_size: int = 49408
    dim: int = 512
    max_positions: int = 77
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ids):  # [B, L] -> [B, L, D]
        tok = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                       name="token_embedding")(ids)
        pos = nn.Embed(self.max_positions, self.dim, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(ids.shape[1]))
        return tok + pos[None]


class QuestionEncoder(nn.Module):
    """4-layer post-LN transformer encoder, d=512, 8 heads, ffn 2048,
    final LayerNorm (``isubgvqa.py:126-134``,
    ``question_encoder.py:22-25``).

    On TPU the deterministic (eval) path runs the fused Pallas layer
    kernels (``ops/pallas/text_kernel.py``) — the final LayerNorm folds
    into the last layer's kernel call; training keeps the XLA
    composition (live dropout), sharing the same params."""

    dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 4
    dropout: float = 0.1
    vocab_size: int = 49408
    use_pallas: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ids, attn_mask, deterministic=True):
        """ids [B, L], attn_mask [B, L] (1 = real) -> encoded [B, L, D]."""
        from ..ops.pallas import text_kernel

        x = TextEmbedding(self.vocab_size, self.dim, dtype=self.dtype,
                          name="text_vocab_embedding")(ids)
        layers = [PostLNTransformerLayer(self.dim, self.num_heads,
                                         self.ffn_dim, self.dropout,
                                         dtype=self.dtype, name=f"layer{i}")
                  for i in range(self.num_layers)]
        final = LNParams(self.dim, name="final_norm")

        on_tpu = _on_tpu()   # module-local seam (utils/platform.py)
        run_fused = (self.use_pallas and deterministic
                     and (on_tpu or text_kernel.FORCE_INTERPRET))
        if run_fused:
            mask_f = attn_mask.astype(jnp.float32)
            for i, layer in enumerate(layers):
                last = i == self.num_layers - 1
                x = text_kernel.fused_encoder_layer(
                    x, mask_f, layer.kernel_params(),
                    num_heads=self.num_heads,
                    final_ln=(final.scale, final.bias) if last else None,
                    interpret=text_kernel.FORCE_INTERPRET)
            return x

        if not deterministic:
            # Training: dropout keep masks are drawn here (the module's
            # ``dropout`` RNG stream) and passed explicitly, so the
            # fused Pallas custom-VJP layers (ops/pallas/text_train.py)
            # and the XLA oracle consume identical noise by
            # construction; the final LayerNorm stays XLA (cheap,
            # differentiable).
            from ..ops.pallas import text_train

            fuse = (self.use_pallas
                    and (on_tpu or text_train.FORCE_INTERPRET))
            b, l = ids.shape
            mask_f = attn_mask.astype(jnp.float32)
            for layer in layers:
                masks = (draw_encoder_dropout_masks(
                    self.make_rng("dropout"), b, l, dim=self.dim,
                    ffn_dim=self.ffn_dim, num_heads=self.num_heads,
                    rate=self.dropout) if self.dropout > 0.0 else None)
                params = layer.kernel_params()
                if fuse:
                    x = text_train.fused_encoder_layer_train(
                        x, mask_f, masks, params, self.num_heads,
                        text_train.FORCE_INTERPRET)
                else:
                    x = encoder_layer_reference(
                        x, mask_f, masks, params,
                        num_heads=self.num_heads, dtype=self.dtype)
            return ln_apply(x, final.scale, final.bias, self.dtype)

        # emb_proj + PositionalEncoding exist in the reference but are
        # bypassed in its live path (question_encoder.py:33-34); omitted.
        # float key-padding mask is ADDED to logits (see module doc)
        key_bias = attn_mask.astype(jnp.float32)[:, None, None, :]
        for layer in layers:
            x = layer(x, key_bias=key_bias, deterministic=True)
        return ln_apply(x, final.scale, final.bias, self.dtype)
