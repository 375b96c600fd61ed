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

import jax.numpy as jnp
from flax import linen as nn

from .layers import PostLNDecoderLayer


class QuestionDecoder(nn.Module):
    n_instructions: int = 4
    dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory, deterministic=True):
        """memory [B, L, D] -> instruction vectors [B, n_instr, D]."""
        b = memory.shape[0]
        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.n_instructions, self.dim),
        )
        tgt = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        tgt = tgt.astype(memory.dtype)
        for i in range(self.num_layers):
            tgt = PostLNDecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                     self.dropout, dtype=self.dtype,
                                     name=f"layer{i}")(
                tgt, memory, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(tgt)
