"""Program decoder: DETR-style learned queries -> instruction vectors.

Equivalent of ``QuestionDecoder`` (``models/question_decoder.py:4-71``):
``mgat_layers`` (=4) learned query embeddings cross-attend the encoded
question through a 3-layer post-LN transformer decoder,
non-autoregressively, with a final LayerNorm.  The reference passes no
memory padding mask (``question_decoder.py:65-67``), so padded question
positions are attended — reproduced.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.platform import on_tpu_backend as _on_tpu
from .layers import (LNParams, PostLNDecoderLayer,
                     decoder_layer_reference, draw_decoder_dropout_masks,
                     ln_apply)


class QuestionDecoder(nn.Module):
    """On TPU the deterministic (eval) path runs the fused Pallas
    decoder-layer kernels (``ops/pallas/text_kernel.py``); training
    keeps the XLA composition (live dropout), sharing the params."""

    n_instructions: int = 4
    dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.1
    use_pallas: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory, deterministic=True):
        """memory [B, L, D] -> instruction vectors [B, n_instr, D]."""
        from ..ops.pallas import text_kernel

        b = memory.shape[0]
        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.n_instructions, self.dim),
        )
        tgt = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        tgt = tgt.astype(memory.dtype)
        layers = [PostLNDecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                     self.dropout, dtype=self.dtype,
                                     name=f"layer{i}")
                  for i in range(self.num_layers)]
        final = LNParams(self.dim, name="final_norm")

        on_tpu = _on_tpu()   # module-local seam (utils/platform.py)
        # the f32 decoder's weight blocks (2 MHA + FFN) exceed the
        # per-program VMEM budget; the fused path runs for bf16 models
        # (and under test interpret mode)
        run_fused = (self.use_pallas and deterministic
                     and ((on_tpu and memory.dtype == jnp.bfloat16)
                          or text_kernel.FORCE_INTERPRET))
        if run_fused:
            for i, layer in enumerate(layers):
                last = i == self.num_layers - 1
                tgt = text_kernel.fused_decoder_layer(
                    tgt, memory, layer.kernel_params(),
                    num_heads=self.num_heads,
                    final_ln=(final.scale, final.bias) if last else None,
                    interpret=text_kernel.FORCE_INTERPRET)
            return tgt

        if not deterministic:
            # Training: explicit dropout keep masks shared between the
            # fused custom-VJP path (ops/pallas/text_train.py) and the
            # XLA oracle (see QuestionEncoder); the fused decoder is
            # bf16-gated on TPU like the eval kernel (VMEM budget).
            from ..ops.pallas import text_train

            fuse = (self.use_pallas
                    and ((on_tpu and memory.dtype == jnp.bfloat16)
                         or text_train.FORCE_INTERPRET))
            t, l = tgt.shape[1], memory.shape[1]
            for layer in layers:
                masks = (draw_decoder_dropout_masks(
                    self.make_rng("dropout"), b, t, l, dim=self.dim,
                    ffn_dim=self.ffn_dim, num_heads=self.num_heads,
                    rate=self.dropout) if self.dropout > 0.0 else None)
                params = layer.kernel_params()
                if fuse:
                    tgt = text_train.fused_decoder_layer_train(
                        tgt, memory, masks, params, self.num_heads,
                        text_train.FORCE_INTERPRET)
                else:
                    tgt = decoder_layer_reference(
                        tgt, memory, masks, params,
                        num_heads=self.num_heads, dtype=self.dtype)
            return ln_apply(tgt, final.scale, final.bias, self.dtype)

        for layer in layers:
            tgt = layer(tgt, memory, deterministic=True)
        return ln_apply(tgt, final.scale, final.bias, self.dtype)
